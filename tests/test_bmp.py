"""Pure-numpy BMP codec (multimodal/bmp.py) — the image twin of the
round-8 WAV move: the image pipeline must decode GENUINE container
bytes, not a fake-pixel stub. Covers bit-exact roundtrip (grayscale,
color, hypothesis-random incl. every row-padding residue), top-down
row order, the loud-refusal contract outside the uncompressed-24-bit
subset, exact-integer luma, and the Spark end-to-end: attach_bmp_media
blobs through decode_features and a resize whose OUTPUT is itself a
valid BMP."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.multimodal.bmp import (
    decode_bmp,
    encode_bmp,
    luma,
)
from aliyun_emapreduce_datasources_spark.multimodal.media import (
    attach_bmp_media,
    decode_features,
    resize_media,
)


def _gray(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)


def _rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---- roundtrip ---------------------------------------------------------

def test_roundtrip_gray_replicates_channels():
    g = _gray(5, 7)
    img = decode_bmp(encode_bmp(g))
    assert img.shape == (5, 7, 3)
    for c in range(3):
        np.testing.assert_array_equal(img[:, :, c], g)


def test_roundtrip_rgb():
    a = _rgb(9, 4, seed=1)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(a)), a)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every stride residue
def test_row_padding_residues(w):
    a = _rgb(3, w, seed=w)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(a)), a)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_roundtrip_random(h, w, seed):
    a = _rgb(h, w, seed=seed)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(a)), a)


def test_canonical_size():
    # 24-bit, stride padded to 4: 7px → 21 → 24 bytes/row
    wav = encode_bmp(_gray(2, 7))
    assert len(wav) == 54 + 2 * 24
    assert wav[:2] == b"BM"


def test_top_down_negative_height():
    a = _rgb(4, 3, seed=2)
    bottom_up = bytearray(encode_bmp(a))
    # flip to top-down: negate biHeight (offset 14+8), reverse rows
    h = struct.unpack_from("<i", bottom_up, 22)[0]
    struct.pack_into("<i", bottom_up, 22, -h)
    stride = (3 * 3 + 3) & ~3
    pix = bytes(bottom_up[54:])
    rows = [pix[i * stride : (i + 1) * stride] for i in range(4)]
    td = bytes(bottom_up[:54]) + b"".join(reversed(rows))
    np.testing.assert_array_equal(decode_bmp(td), a)


# ---- refusal contract --------------------------------------------------

def test_refuses_bad_magic():
    bad = b"PM" + encode_bmp(_gray(2, 2))[2:]
    with pytest.raises(ValueError, match="bad magic"):
        decode_bmp(bad)


def test_refuses_compressed():
    b = bytearray(encode_bmp(_gray(2, 2)))
    struct.pack_into("<I", b, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="biCompression=1"):
        decode_bmp(bytes(b))


def test_refuses_8bit():
    b = bytearray(encode_bmp(_gray(2, 2)))
    struct.pack_into("<H", b, 28, 8)
    with pytest.raises(ValueError, match="bit depth 8"):
        decode_bmp(bytes(b))


def test_refuses_truncated_pixels():
    wav = encode_bmp(_gray(10, 10))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(wav[:-20])


def test_encode_refuses_non_uint8():
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(np.zeros((2, 2), dtype=np.float32))


# ---- luma --------------------------------------------------------------

def test_luma_exact_integer_mean():
    img = np.array([[[0, 1, 2], [255, 255, 254]]], dtype=np.uint8)
    np.testing.assert_array_equal(luma(img), np.array([[1, 254]], dtype=np.uint8))


def test_luma_of_gray_encode_is_identity():
    g = _gray(6, 6, seed=3)
    np.testing.assert_array_equal(luma(decode_bmp(encode_bmp(g))), g)


# ---- Spark end-to-end ---------------------------------------------------

def test_attach_bmp_blobs_are_real_bmp(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(5)
    rows = attach_bmp_media(docs, "doc_id", "text").collect()
    assert rows
    for r in rows:
        img = decode_bmp(bytes(r.payload))
        w, h = r.media_id % 64 + 16, r.media_id % 48 + 16
        assert img.shape == (h, w, 3)
        assert r.meta.n_bytes == len(r.payload)
        assert r.meta.format == "bmp"


def test_decode_features_real_decode_matches_metadata(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(8)
    media = attach_bmp_media(docs, "doc_id", "text")
    for r in decode_features(media).collect():
        w, h = r.media_id % 64 + 16, r.media_id % 48 + 16
        assert r.n_pixels == w * h
        assert 0.0 <= r.mean_luma <= 255.0 and r.std_luma > 0.0


def test_resize_output_is_valid_bmp(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(3)
    media = attach_bmp_media(docs, "doc_id", "text")
    for r in resize_media(media, 8, 6).collect():
        img = decode_bmp(bytes(r.payload))  # re-encoded container parses
        assert img.shape == (6, 8, 3)
        assert r.meta.width == 8 and r.meta.height == 6
        assert r.meta.n_bytes == len(r.payload)


def test_refuses_offset_inside_headers():
    """Round-8 review finding: a crafted bfOffBits pointing inside the
    54-byte header region must refuse, not decode header bytes as
    pixels."""
    b = bytearray(encode_bmp(_gray(4, 4)))
    struct.pack_into("<I", b, 10, 0)  # bfOffBits = 0
    with pytest.raises(ValueError, match="inside the headers"):
        decode_bmp(bytes(b))


def test_resize_preserves_color(spark):
    """Round-8 review finding: resizing a genuine COLOR BMP must come
    back as a resized color BMP, not a grayscale projection."""
    rgb = _rgb(8, 8, seed=5)
    wav = encode_bmp(rgb)
    df = spark.createDataFrame(
        [(1, bytearray(wav), ("image", "bmp", 8, 8, 0, len(wav), "d"))],
        "media_id long, payload binary, "
        "meta struct<modality:string,format:string,width:int,height:int,"
        "duration_ms:bigint,n_bytes:bigint,digest:string>",
    )
    r = resize_media(df, 4, 4).collect()[0]
    out = decode_bmp(bytes(r.payload))
    assert out.shape == (4, 4, 3)
    # nearest-neighbor of the original color planes, channel-exact
    yi = np.linspace(0, 7, 4).round().astype(int)
    xi = np.linspace(0, 7, 4).round().astype(int)
    np.testing.assert_array_equal(out, rgb[np.ix_(yi, xi)])
