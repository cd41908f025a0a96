"""Catalog entries for the multimodal layer.

Only the VIDEO decode remains stubbed (no video libs in this
container — media.py STUB NOTE); its Spark-side plumbing is fully
exercised and oracle-checked (the variable 1→N frame explode, exact
frame-index set, timestamps, digests).

The AUDIO and IMAGE entries are NOT stubbed: media_audio_features
attaches genuine RIFF/WAVE containers whose oracle checks sample
counts that only come out right if the pure-numpy chunk-walking
parser (multimodal/wav.py) reads the data chunk correctly, and
media_pipeline attaches genuine 24-bit BMPs whose oracle pins the
decoded plane size through the real header/row-padding parser
(multimodal/bmp.py). Pixel/PCM statistics are RNG-synth values
covered by tests/test_bmp.py and tests/test_wav.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.multimodal.media import (
    attach_bmp_media,
    attach_fake_video,
    attach_wav_audio,
    audio_features,
    decode_features,
    frame_sample,
    video_frame_sample,
)
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["QUERIES", "ORACLES"]


def media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → GENUINE 24-bit BMP blobs (attach_bmp_media) → real
    header/row-padding decode (multimodal/bmp.py) → features + frame
    sampling → (media_id, n_pixels, n_frames). n_pixels is the DECODED
    plane size — the parser must read biWidth/biHeight and strip the
    row padding correctly for (id%64+16)·(id%48+16) to come out — so
    the oracle pins a real container decode, the image twin of the
    WAV move."""
    # NULL-text docs yield no blob (payload seed is the text) — a real
    # ingest would likewise skip rows with no media bytes
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    media = attach_bmp_media(docs, "doc_id", "text")
    feats = decode_features(media).select("media_id", "n_pixels")
    frames = (
        frame_sample(media, every_n=4, n_frames=16)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    return feats.join(frames, "media_id")


# n_pixels mirrors attach_fake_media's metadata derivation
# (width = id%64+16, height = id%48+16); n_frames = |range(0,16,4)|.
ORACLE_MEDIA = """
SELECT doc_id AS media_id,
       CAST((doc_id % 64 + 16) * (doc_id % 48 + 16) AS BIGINT) AS n_pixels,
       CAST(4 AS BIGINT) AS n_frames
FROM documents WHERE text IS NOT NULL
"""


def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → GENUINE RIFF/WAVE blobs (attach_wav_audio) → real
    chunk-walking PCM16 decode (multimodal/wav.py) → frame (25 ms /
    10 ms hop) → per-media frame accounting. n_samples is the DECODED
    sample count (no longer metadata trust — the parser must read the
    data chunk correctly for duration_ms × 16 to come out), n_frames
    the stride-framing count over it, so the oracle now pins a real
    end-to-end decode; the pooled RMS/ZCR stats are RNG-synth values
    covered by tests/test_wav.py instead."""
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    audio = attach_wav_audio(docs, "doc_id", "text")
    return audio_features(audio).select("media_id", "n_samples", "n_frames")


# mirrors attach_fake_audio metadata (duration_ms = doc_id%2000+500,
# SR=16000) and audio_features framing (1 + (n-400) // 160).
ORACLE_AUDIO = """
SELECT doc_id AS media_id,
       CAST((doc_id % 2000 + 500) * 16 AS BIGINT) AS n_samples,
       CAST(1 + ((doc_id % 2000 + 500) * 16 - 400) // 160 AS BIGINT) AS n_frames
FROM documents WHERE text IS NOT NULL
"""


def media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → fake video blobs (duration 1–5 s metadata) →
    duration-driven frame sampling → one row per sampled frame.

    Unlike media_pipeline's fixed-fanout frame check, the frame count
    here VARIES per media (8–39 frames at 8 fps), and the oracle's
    generate_series reconstruction pins the exact frame-index set,
    timestamps, and per-frame digests — so the variable 1→N explode
    inside mapInPandas (the real video-decode shape) is hash-checked
    end to end, not just counted."""
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    video = attach_fake_video(docs, "doc_id", "text")
    return video_frame_sample(video, fps=8, every_n=3).orderBy(
        "media_id", "frame_idx"
    )


# mirrors attach_fake_video metadata (duration_ms = doc_id%4000+1000,
# FPS=8, n_total = duration*8//1000) and video_frame_sample's
# every-3rd-frame walk + sha256("<payload-digest>:<idx>") naming.
ORACLE_VIDEO = """
SELECT doc_id AS media_id,
       CAST(gs.f AS INTEGER) AS frame_idx,
       CAST(gs.f * 1000 // 8 AS BIGINT) AS frame_ts_ms,
       sha256(sha256(text) || ':' || CAST(gs.f AS VARCHAR)) AS frame_digest
FROM documents,
     unnest(generate_series(0, (doc_id % 4000 + 1000) * 8 // 1000 - 1, 3)) AS gs(f)
WHERE text IS NOT NULL
ORDER BY media_id, frame_idx
"""


QUERIES = {
    "media_pipeline": media_pipeline,
    "media_audio_features": media_audio_features,
    "media_video_frames": media_video_frames,
}
ORACLES = {
    "media_pipeline": ORACLE_MEDIA,
    "media_audio_features": ORACLE_AUDIO,
    "media_video_frames": ORACLE_VIDEO,
}
