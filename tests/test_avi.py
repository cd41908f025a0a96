"""Pure-numpy AVI codec (multimodal/avi.py) — the video leg of the
round-8 real-container work: uncompressed RIFF/AVI with raw-DIB 00db
frames, round-tripped bit-exactly, refused loudly outside that subset,
and driven end-to-end through Spark (attach_avi_video →
video_frame_sample's real decode leg, frame digests over ACTUAL
decoded pixels)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.multimodal.avi import (
    decode_avi,
    encode_avi,
)
from aliyun_emapreduce_datasources_spark.multimodal.media import (
    AVI_FPS,
    AVI_H,
    AVI_W,
    attach_avi_video,
    video_frame_sample,
)


def _clip(n, h, w, seed=0, gray=False):
    rng = np.random.default_rng(seed)
    shape = (n, h, w) if gray else (n, h, w, 3)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---- roundtrip ---------------------------------------------------------

def test_roundtrip_rgb():
    clip = _clip(5, 6, 7, seed=1)
    frames, fps = decode_avi(encode_avi(clip, 8))
    assert fps == 8
    np.testing.assert_array_equal(frames, clip)


def test_roundtrip_gray_replicates():
    clip = _clip(3, 4, 5, seed=2, gray=True)
    frames, fps = decode_avi(encode_avi(clip, 25))
    assert fps == 25
    for c in range(3):
        np.testing.assert_array_equal(frames[:, :, :, c], clip)


def test_zero_frames():
    frames, fps = decode_avi(encode_avi(_clip(0, 4, 4), 8))
    assert frames.shape == (0, 4, 4, 3) and fps == 8


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=8),
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),  # exercises every stride pad
    fps=st.sampled_from([1, 8, 24, 30]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_roundtrip_random(n, h, w, fps, seed):
    clip = _clip(n, h, w, seed=seed)
    frames, fps2 = decode_avi(encode_avi(clip, fps))
    assert fps2 == fps
    np.testing.assert_array_equal(frames, clip)


# ---- refusal contract --------------------------------------------------

def test_refuses_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        decode_avi(b"XIFF" + encode_avi(_clip(1, 2, 2), 8)[4:])


def test_refuses_wav_form():
    avi = encode_avi(_clip(1, 2, 2), 8)
    with pytest.raises(ValueError, match="not AVI"):
        decode_avi(avi[:8] + b"WAVE" + avi[12:])


def test_refuses_compressed_frame_chunk():
    avi = bytearray(encode_avi(_clip(2, 2, 2), 8))
    i = bytes(avi).find(b"00db")
    assert i != -1
    avi[i : i + 4] = b"00dc"
    with pytest.raises(ValueError, match="00dc"):
        decode_avi(bytes(avi))


def test_refuses_wrong_bit_depth():
    avi = bytearray(encode_avi(_clip(1, 2, 2), 8))
    i = bytes(avi).find(b"strf")
    struct.pack_into("<H", avi, i + 8 + 14, 8)  # biBitCount in strf body
    with pytest.raises(ValueError, match="bit depth 8"):
        decode_avi(bytes(avi))


def test_refuses_truncated_frame():
    # lying about the frame size misaligns the chunk walk — either the
    # per-frame size check or the walker's overrun check must refuse;
    # both are loud ValueErrors from the decoder, never garbage pixels
    avi = bytearray(encode_avi(_clip(1, 4, 4), 8))
    i = bytes(avi).find(b"00db")
    struct.pack_into("<I", avi, i + 4, 7)  # lie: 7-byte frame
    with pytest.raises(ValueError, match="decode_avi"):
        decode_avi(bytes(avi))


def test_encode_refuses_bad_fps_and_dtype():
    with pytest.raises(ValueError, match="fps"):
        encode_avi(_clip(1, 2, 2), 0)
    with pytest.raises(ValueError, match="uint8"):
        encode_avi(np.zeros((1, 2, 2, 3), dtype=np.int32), 8)


# ---- Spark end-to-end ---------------------------------------------------

def test_attach_avi_blobs_are_real_avi(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(4)
    rows = attach_avi_video(docs, "doc_id", "text").collect()
    assert rows
    for r in rows:
        frames, fps = decode_avi(bytes(r.payload))
        n = (r.media_id % 4000 + 1000) * AVI_FPS // 1000
        assert fps == AVI_FPS
        assert frames.shape == (n, AVI_H, AVI_W, 3)
        assert r.meta.n_bytes == len(r.payload)
        assert r.meta.format == "avi"


def test_video_frame_sample_real_decode(spark, sf_dir):
    """The real leg: counts/timestamps from the PARSED container and
    digests over the decoded pixels — recomputed independently here
    from the same deterministic synth."""
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(4)
    video = attach_avi_video(docs, "doc_id", "text")
    got: dict = {}
    for r in video_frame_sample(video, fps=AVI_FPS, every_n=3).collect():
        got.setdefault(r.media_id, {})[r.frame_idx] = (
            r.frame_ts_ms,
            r.frame_digest,
        )
    src = {r.doc_id: r.text for r in docs.collect()}
    assert set(got) == set(src)
    for mid, text in src.items():
        digest = hashlib.sha256(str(text).encode()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
        n = (mid % 4000 + 1000) * AVI_FPS // 1000
        frames = rng.integers(0, 256, size=(n, AVI_H, AVI_W), dtype=np.uint8)
        rgb = np.repeat(frames[:, :, :, None], 3, axis=3)
        want = {
            idx: (idx * 1000 // AVI_FPS, hashlib.sha256(rgb[idx].tobytes()).hexdigest())
            for idx in range(0, n, 3)
        }
        assert got[mid] == want, f"media {mid} frame set mismatch"


def test_refuses_pathological_list_nesting():
    # hundreds of nested LISTs must refuse as a decoder ValueError,
    # never escape as a Python RecursionError
    inner = b"avih" + struct.pack("<I", 56) + b"\x00" * 56
    for _ in range(64):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"hdrl" + inner
    body = b"AVI " + inner
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="nesting"):
        decode_avi(avi)


def test_top_down_negative_strf_height():
    """Round-8 review finding: a top-down AVI (negative strf biHeight,
    a layout real encoders emit) must decode with row 0 = image top,
    not vertically mirrored."""
    clip = _clip(2, 4, 3, seed=7)
    avi = bytearray(encode_avi(clip, 8))
    i = bytes(avi).find(b"strf")
    h = struct.unpack_from("<i", avi, i + 8 + 8)[0]
    struct.pack_into("<i", avi, i + 8 + 8, -h)  # biHeight -> top-down
    # rewrite each frame's rows in top-down order
    stride = (3 * 3 + 3) & ~3
    pos = 0
    for f in range(2):
        j = bytes(avi).find(b"00db", pos)
        body = j + 8
        pix = bytes(avi[body : body + stride * 4])
        rows = [pix[r * stride : (r + 1) * stride] for r in range(4)]
        avi[body : body + stride * 4] = b"".join(reversed(rows))
        pos = body + stride * 4
    frames, _ = decode_avi(bytes(avi))
    np.testing.assert_array_equal(frames, clip)


def test_refuses_undersized_header_chunks():
    avi = bytearray(encode_avi(_clip(1, 2, 2), 8))
    i = bytes(avi).find(b"avih")
    bad = bytearray(avi)
    struct.pack_into("<I", bad, i + 4, 4)  # avih declares 4 bytes
    with pytest.raises(ValueError, match="avih chunk too short"):
        decode_avi(bytes(bad))


def test_refuses_short_list_chunk():
    avi = encode_avi(_clip(1, 2, 2), 8)
    # splice a LIST declaring size 2 (cannot even hold its form)
    spliced = avi[:12] + b"LIST" + struct.pack("<I", 2) + b"xx" + avi[12:]
    fixed = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    with pytest.raises(ValueError, match="LIST chunk too short"):
        decode_avi(fixed)


def test_encode_refuses_unrepresentable_fps():
    with pytest.raises(ValueError, match="1e6"):
        encode_avi(_clip(1, 2, 2), 2_000_000)


def test_decoder_refuses_sub_one_fps_period():
    # dwMicroSecPerFrame > 1e6 rounds to fps=0; the decoder must refuse
    # the malformed period (r08 advice), not hand a zero fps to
    # video_frame_sample's division
    avi = bytearray(encode_avi(_clip(1, 2, 2), 8))
    i = bytes(avi).find(b"avih")
    struct.pack_into("<I", avi, i + 8, 2_000_001)  # first avih field
    with pytest.raises(ValueError, match="fps < 1"):
        decode_avi(bytes(avi))


def test_refuses_zero_dims():
    # w=0/h=0 would pass the frame-length check vacuously (stride*h ==
    # 0 == empty chunk) and IndexError in downstream pixel probes —
    # must refuse like every other malformed-geometry case (r09 review)
    avi = bytearray(encode_avi(_clip(1, 2, 2), 8))
    i = bytes(avi).find(b"avih")
    struct.pack_into("<II", avi, i + 8 + 32, 0, 0)
    j = bytes(avi).find(b"strf")
    struct.pack_into("<ii", avi, j + 8 + 4, 0, 0)
    with pytest.raises(ValueError, match="non-positive frame dims"):
        decode_avi(bytes(avi))


def test_refuses_giant_declared_dims_before_allocating():
    # a tiny crafted file declaring ~8 GB of frame data via huge avih/
    # strf dimensions over an empty 00db chunk must refuse by frame-
    # length validation (r08 advice), never attempt the allocation
    avi = bytearray(encode_avi(_clip(1, 2, 2), 8))
    big_w, big_h = 32_768, 32_768
    i = bytes(avi).find(b"avih")
    struct.pack_into("<II", avi, i + 8 + 32, big_w, big_h)
    j = bytes(avi).find(b"strf")
    struct.pack_into("<ii", avi, j + 8 + 4, big_w, big_h)
    with pytest.raises(ValueError, match="required for 32768x32768"):
        decode_avi(bytes(avi))


# ---- gradient-AVI catalog leg (r08 verdict ask #2) -----------------------

def test_gradient_geometry_exercises_row_padding():
    # the whole point of GRAD_W=17: 51-byte rows force a 1-byte DIB pad
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        GRAD_H,
        GRAD_W,
        _gradient_frames,
    )

    assert (GRAD_W * 3) % 4 != 0
    clip = _gradient_frames(123, 7)
    assert clip.shape == (7, GRAD_H, GRAD_W, 3)
    got, fps = decode_avi(encode_avi(clip, 8))
    assert fps == 8
    np.testing.assert_array_equal(got, clip)


def test_gradient_pixel_law_matches_oracle_closed_form():
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        _gradient_frames,
    )

    mid, idx = 421, 9
    fr = _gradient_frames(mid, idx + 1)[idx]
    g00 = (mid + 13 * idx) % 256
    assert fr[0, 0, 0] == g00
    assert fr[0, 0, 1] == (g00 + 85) % 256
    assert fr[0, 0, 2] == (g00 + 170) % 256
    assert fr[-1, -1, 2] == (mid + 13 * idx + 2 * 10 + 3 * 16 + 170) % 256


def test_video_metrics_catch_orientation_and_channel_bugs(spark, sf_dir):
    """The catalog oracle's corner probes must DETECT a skipped
    bottom-up flip and a BGR/RGB swap: simulate each codec bug on the
    decoded clip and assert the probe values change."""
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        _gradient_frames,
    )

    fr = _gradient_frames(5, 1)[0]
    flipped = fr[::-1]          # skipped bottom-up flip
    swapped = fr[:, :, ::-1]    # BGR left as-is
    assert flipped[0, 0, 0] != fr[0, 0, 0]
    assert swapped[0, 0, 0] != fr[0, 0, 0]
    # a padding mis-strip shifts every row's pixels right by the pad
    assert fr[0, 1, 0] != fr[0, 0, 0]


def test_media_video_frames_real_decode_e2e(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        attach_avi_gradient_video,
        video_frame_metrics,
    )
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(5)
    media = attach_avi_gradient_video(docs, "doc_id")
    # every payload is a genuine RIFF/AVI container
    for r in media.select("media_id", "payload", "meta").collect():
        frames, fps = decode_avi(bytes(r.payload))
        assert fps == 8
        n = (r.media_id % 4000 + 1000) * 8 // 1000
        assert frames.shape[0] == n
        assert r.meta.n_bytes == len(r.payload)
    out = video_frame_metrics(media, every_n=3).toPandas()
    for _, row in out.iterrows():
        mid, idx = int(row.media_id), int(row.frame_idx)
        assert row.corner_tl_r == (mid + 13 * idx) % 256
        assert row.corner_br_b == (mid + 13 * idx + 238) % 256


def test_video_metrics_refuses_non_avi_payload(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        attach_fake_video,
        video_frame_metrics,
    )
    from aliyun_emapreduce_datasources_spark.operators.common import t
    from py4j.protocol import Py4JJavaError

    docs = t(spark, sf_dir, "documents").where("text IS NOT NULL").limit(1)
    fake = attach_fake_video(docs, "doc_id", "text")
    with pytest.raises(Exception, match="RIFF|PythonException|decode_avi"):
        video_frame_metrics(fake).collect()
