"""Pure-numpy+zlib PNG codec (multimodal/png.py) — the round-10
compressed-container leg (r09 verdict ask #4): genuine DEFLATE'd PNGs
round-tripped bit-exactly through every scanline filter, a hand-built
golden container decoded from first principles, and crafted
corruptions refused loudly."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.multimodal.png import (
    decode_png,
    encode_png,
)


def _img(h, w, seed=0, gray=False):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---- roundtrip ---------------------------------------------------------


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_rgb_each_filter(ft):
    img = _img(9, 13, seed=ft)
    np.testing.assert_array_equal(decode_png(encode_png(img, ft)), img)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_gray_each_filter(ft):
    img = _img(7, 5, seed=10 + ft, gray=True)
    np.testing.assert_array_equal(decode_png(encode_png(img, ft)), img)


def test_roundtrip_mixed_filters_per_row():
    img = _img(11, 17, seed=42)
    fts = [y % 5 for y in range(11)]
    np.testing.assert_array_equal(decode_png(encode_png(img, fts)), img)


def test_roundtrip_degenerate_sizes():
    for h, w in [(1, 1), (1, 9), (9, 1), (2, 2)]:
        img = _img(h, w, seed=h * 10 + w)
        np.testing.assert_array_equal(decode_png(encode_png(img, 4)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    gray=st.booleans(),
    seed=st.integers(0, 2**16),
)
def test_roundtrip_hypothesis(h, w, gray, seed):
    img = _img(h, w, seed=seed, gray=gray)
    fts = [(seed + y) % 5 for y in range(h)]
    np.testing.assert_array_equal(decode_png(encode_png(img, fts)), img)


# ---- golden container (built by hand, not by the encoder) -------------


def _chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_golden_2x2_gray_sub_filter():
    """2x2 grayscale, row 0 filter None [7, 9], row 1 filter Sub
    [200, 100] -> recon [200, 44] (100+200 mod 256). Built byte by
    byte from the spec, never through encode_png."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    scan = bytes([0, 7, 9, 1, 200, 100])
    payload = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        decode_png(payload), np.array([[7, 9], [200, 44]], dtype=np.uint8)
    )


def test_multiple_idat_chunks_concatenate():
    img = _img(4, 4, seed=3)
    good = encode_png(img, 2)
    # split the single IDAT into two: decoder must concatenate
    sig_len = 8
    ihdr_end = sig_len + 12 + 13
    (ilen,) = struct.unpack_from(">I", good, ihdr_end)
    idat = good[ihdr_end + 8 : ihdr_end + 8 + ilen]
    iend = good[ihdr_end + 12 + ilen :]
    rebuilt = (
        good[:ihdr_end]
        + _chunk(b"IDAT", idat[:5])
        + _chunk(b"IDAT", idat[5:])
        + iend
    )
    np.testing.assert_array_equal(decode_png(rebuilt), img)


def test_ancillary_chunks_skipped():
    img = _img(3, 3, seed=4)
    good = encode_png(img)
    ihdr_end = 8 + 12 + 13
    with_text = (
        good[:ihdr_end] + _chunk(b"tEXt", b"k\x00v") + good[ihdr_end:]
    )
    np.testing.assert_array_equal(decode_png(with_text), img)


# ---- loud refusals ------------------------------------------------------


def _mutate(b, pos, val):
    out = bytearray(b)
    out[pos] = val
    return bytes(out)


def test_refuses_bad_signature():
    good = encode_png(_img(2, 2))
    with pytest.raises(ValueError, match="signature"):
        decode_png(_mutate(good, 1, 0x51))


def test_refuses_crc_mismatch():
    good = encode_png(_img(4, 4, seed=5))
    # flip one byte inside IHDR data (pos 8+8 = first data byte)
    with pytest.raises(ValueError, match="CRC"):
        decode_png(_mutate(good, 16, good[16] ^ 0xFF))


def test_refuses_truncated():
    good = encode_png(_img(4, 4, seed=6))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[: len(good) // 2])


def test_refuses_palette_and_exotic_depths():
    sig = b"\x89PNG\r\n\x1a\n"
    for depth, ctype_v, msg in [
        (16, 2, "bit depth"),
        (8, 3, "color type"),
        (8, 6, "color type"),
    ]:
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype_v, 0, 0, 0)
        payload = (
            sig
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match=msg):
            decode_png(payload)


def test_refuses_interlaced():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    payload = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(6)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(payload)


def test_refuses_scanline_length_lie():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)  # needs 3*(1+3)=12
    payload = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(11)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline"):
        decode_png(payload)


def test_refuses_garbage_idat():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    payload = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x01\x02\x03not zlib")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflate"):
        decode_png(payload)


def test_refuses_bad_filter_type():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    payload = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes([9, 1, 2])))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        decode_png(payload)


def test_encoder_refuses_bad_inputs():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2), dtype=np.int32))
    with pytest.raises(ValueError, match="shape|must be"):
        encode_png(np.zeros((2, 2, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="empty"):
        encode_png(np.zeros((0, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="row_filters"):
        encode_png(np.zeros((2, 2), dtype=np.uint8), [0])
