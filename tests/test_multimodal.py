"""Multimodal plumbing tests: schema contract, determinism, batch
shape, and the 1→N frame-sampling explode — the parts that must be
real even while the codec is stubbed."""

from __future__ import annotations

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.multimodal.media import (
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_features,
    frame_sample,
)
from aliyun_emapreduce_datasources_spark.operators.common import t


def _media(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(50)
    return attach_fake_media(docs, "doc_id", "text")


def test_media_schema_contract(spark, sf_dir):
    media = _media(spark, sf_dir)
    # simpleString ignores nullability (lit-derived cols are non-null)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    row = media.head()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.meta.n_bytes == len(row.payload) > 0
    assert row.meta.modality == "image"


def test_decode_features_deterministic_and_complete(spark, sf_dir):
    media = _media(spark, sf_dir)
    feats = decode_features(media)
    assert feats.schema == FEATURES_SCHEMA
    rows1 = {r.media_id: (r.mean_luma, r.n_pixels) for r in feats.collect()}
    rows2 = {r.media_id: (r.mean_luma, r.n_pixels) for r in decode_features(media).collect()}
    assert rows1 == rows2  # stub decoder is deterministic
    assert len(rows1) == media.count()  # no rows lost across batch re-chunking
    meta = {r.media_id: (r.meta.width, r.meta.height) for r in media.collect()}
    for mid, (_, n_pixels) in rows1.items():
        w, h = meta[mid]
        assert n_pixels == w * h


def test_decode_features_small_byte_budget_rechunks(spark, sf_dir):
    media = _media(spark, sf_dir)
    # force one-row decode chunks; output must be identical
    small = {r.media_id for r in decode_features(media, batch_bytes=1).collect()}
    assert len(small) == media.count()


def test_frame_sample_explodes(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = frame_sample(media, every_n=4, n_frames=16)
    n_media = media.count()
    assert frames.count() == n_media * 4
    per = frames.groupBy("media_id").agg(F.countDistinct("frame_idx").alias("n")).collect()
    assert all(r.n == 4 for r in per)
    # deterministic digests
    d1 = {(r.media_id, r.frame_idx): r.frame_digest for r in frames.collect()}
    d2 = {(r.media_id, r.frame_idx): r.frame_digest for r in frame_sample(media).collect()}
    assert d1 == d2


def test_resize_media_round_trips_contract(spark, sf_dir):
    """resize output must be a valid media table: target dims in meta,
    payload = w*h stub pixels, digest consistent, and decodable again
    by the downstream verbs (chained decode_features)."""
    from aliyun_emapreduce_datasources_spark.multimodal.media import resize_media

    media = _media(spark, sf_dir)
    small = resize_media(media, target_w=8, target_h=6)
    rows = small.collect()
    assert rows and all(r.meta.width == 8 and r.meta.height == 6 for r in rows)
    assert all(len(r.payload) == 8 * 6 == r.meta.n_bytes for r in rows)
    # chained: the resized table feeds decode_features unchanged
    feats = {r.media_id: r.n_pixels for r in decode_features(small).collect()}
    assert set(feats.values()) == {48}
    # deterministic
    d1 = {r.media_id: r.meta.digest for r in rows}
    d2 = {r.media_id: r.meta.digest for r in resize_media(media, 8, 6).collect()}
    assert d1 == d2


def test_audio_features_deterministic_and_framed(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        FRAME,
        HOP,
        SR,
        _decode_audio_stub,
        attach_fake_audio,
        audio_features,
    )
    from aliyun_emapreduce_datasources_spark.operators.common import t
    import numpy as np

    docs = t(spark, sf_dir, "documents").limit(8)
    audio = attach_fake_audio(docs, "doc_id", "text")
    out = audio_features(audio).toPandas().sort_values("media_id").reset_index(drop=True)
    out2 = audio_features(audio).toPandas().sort_values("media_id").reset_index(drop=True)
    # deterministic across runs (stub decoder is digest-seeded)
    assert out.equals(out2)
    # frame accounting matches the stride formula and a direct numpy
    # recomputation of one row's stats
    src = audio.toPandas().iloc[0]
    pcm = _decode_audio_stub(src["payload"], src["meta"]["duration_ms"], SR)
    frames = np.lib.stride_tricks.sliding_window_view(pcm, FRAME)[::HOP]
    row = out[out.media_id == src["media_id"]].iloc[0]
    assert row["n_samples"] == pcm.size
    assert row["n_frames"] == frames.shape[0] == 1 + (pcm.size - FRAME) // HOP
    x = frames.astype(np.float64)
    assert abs(row["mean_rms"] - float(np.sqrt((x * x).mean(axis=1)).mean())) < 1e-9
    zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
    assert abs(row["mean_zcr"] - float(zcr.mean())) < 1e-12
    # decoder refuses empty payloads like a real codec
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _decode_audio_stub(b"", 1000, SR)


def test_audio_features_short_clip_yields_zero_frames(spark, sf_dir):
    """A clip shorter than one 25 ms analysis window must surface as
    n_frames=0 with null pooled stats, not an opaque numpy error —
    reachable once the stub decoder is swapped for a real one."""
    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        SR,
        attach_fake_audio,
        audio_features,
    )
    from pyspark.sql import functions as F
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents").limit(3)
    audio = attach_fake_audio(docs, "doc_id", "text")
    # force sub-window durations (10 ms < 25 ms frame at 16 kHz)
    short = audio.withColumn(
        "meta",
        F.col("meta").withField("duration_ms", F.lit(10).cast("long")),
    )
    out = audio_features(short).toPandas()
    assert len(out) == 3
    assert (out["n_frames"] == 0).all()
    assert (out["n_samples"] == 10 * SR // 1000).all()
    assert out["mean_rms"].isna().all()
    assert out["mean_zcr"].isna().all()


def test_video_frame_sample_variable_fanout(spark, sf_dir):
    """Frame count per media follows duration_ms × fps // 1000 walked
    every 3rd frame; timestamps are exact integer ms; digests are
    deterministic functions of (payload digest, idx)."""
    import hashlib

    from aliyun_emapreduce_datasources_spark.multimodal.media import (
        attach_fake_video,
        video_frame_sample,
    )
    from aliyun_emapreduce_datasources_spark.operators.common import t
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).limit(20)
    video = attach_fake_video(docs, "doc_id", "text")
    meta = {
        r["media_id"]: (r["duration_ms"], r["digest"])
        for r in video.select("media_id", "meta.duration_ms", "meta.digest").collect()
    }
    out = video_frame_sample(video, fps=8, every_n=3).toPandas()
    grouped = out.groupby("media_id")
    assert set(grouped.groups) == set(meta)
    for mid, g in grouped:
        duration_ms, digest = meta[mid]
        n_total = duration_ms * 8 // 1000
        expect_idx = list(range(0, n_total, 3))
        assert sorted(g["frame_idx"]) == expect_idx
        g = g.sort_values("frame_idx")
        assert list(g["frame_ts_ms"]) == [i * 1000 // 8 for i in expect_idx]
        assert list(g["frame_digest"]) == [
            hashlib.sha256(f"{digest}:{i}".encode()).hexdigest() for i in expect_idx
        ]
