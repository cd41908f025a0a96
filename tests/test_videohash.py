"""media_video_neardup (multimodal/videohash.py) — the AVI member of
the near-dup family: perceptual matching over the decoded temporal
envelope.

Value parity vs the DuckDB law oracle runs in test_oracle_parity.py;
this file pins what parity can't see:

- the law luminances survive the REAL container round trip for both
  frames-per-window classes (frame-rate invariance: a 72-frame and a
  144-frame video pool to identical envelope cells),
- the cells come FROM THE DECODED BYTES: corrupting a frame byte
  changes the decoded frame, truncation refuses loudly,
- a BGR/RGB channel swap would move the pooled R cells (the +85/+170
  channel offsets make R != B),
- the banded plan stays bucketed (no CartesianProduct / BNLJ).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.multimodal import videohash
from aliyun_emapreduce_datasources_spark.multimodal.avi import decode_avi


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_banded_plan_never_all_pairs(spark, sf_dir):
    plan = _plan(videohash.video_neardup_pairs(spark, sf_dir, materialize=False))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_law_cells_survive_container_roundtrip(spark):
    df = spark.range(12).select(F.col("id").alias("doc_id"))
    media = videohash.attach_avi_group_videos(df, "doc_id")
    rows = media.select("media_id", "payload", "meta").collect()
    for r in rows:
        frames, fps = decode_avi(bytes(r["payload"]))
        assert fps == videohash.FPS
        fpw = r["media_id"] % 2 + 1
        assert frames.shape == (72 * fpw, videohash.FRAME_H, videohash.FRAME_W, 3)
        # channel offsets present: R != G != B on the decoded frames
        assert frames[0, 0, 0, 1] == (int(frames[0, 0, 0, 0]) + 85) % 256
        assert frames[0, 0, 0, 2] == (int(frames[0, 0, 0, 0]) + 170) % 256
    out = {
        r["media_id"]: r["cells"]
        for r in videohash.video_dhash_cells(media).collect()
    }
    assert len(out) == 12
    for mid, cells in out.items():
        assert cells == videohash._law_cells(mid).tolist(), mid


def test_cells_come_from_decoded_bytes(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    row = videohash.attach_avi_group_videos(df, "doc_id").collect()[0]
    payload = bytearray(row["payload"])
    base, _ = decode_avi(bytes(payload))
    # movi frame data sits near the end; flip a byte inside the last
    # frame's pixel data (well after the headers)
    payload[-10] ^= 0x55
    corrupted, _ = decode_avi(bytes(payload))
    assert not np.array_equal(corrupted, base)
    with pytest.raises(ValueError):
        decode_avi(bytes(payload[:100]))


def test_neardup_pairs_cross_frame_rate_classes(spark, sf_dir):
    docs = (
        videohash.t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id")
        .limit(120)
    )
    media = videohash.attach_avi_group_videos(docs, "doc_id")
    fps_df = videohash.video_dhash_cells(media).select(
        "media_id", videohash.dhash64(F.col("cells")).alias("simhash")
    )
    from aliyun_emapreduce_datasources_spark.dedup.simhash import (
        simhash_candidates,
    )

    pairs = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_candidates(fps_df, id_col="media_id").collect()
    ]
    assert pairs, "fixture produced no near-dup pairs — vacuous test"
    assert all(h <= videohash.MAX_HAMMING for _, _, h in pairs)
    # a 72-frame video must match a 144-frame near-twin (id parity
    # differs -> different frames-per-window)
    assert any(a % 2 != b % 2 for a, b, _ in pairs)
