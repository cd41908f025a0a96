"""media_audio_neardup (multimodal/audiohash.py) — the WAV twin of the
image dHash entry: perceptual near-dup over the decoded time envelope.

Value parity vs the DuckDB law oracle runs in test_oracle_parity.py
like every catalog entry; this file pins what parity can't see:

- the law amplitudes survive the REAL container round trip for every
  window-length class (the duration-invariance leg: different ids
  carry different-length WAVs but pool to identical envelope cells),
- the hash comes FROM THE DECODED BYTES: corrupting PCM bytes changes
  the cells, truncation refuses loudly,
- the engine's dhash64 bit layout and the oracle's (k//9)*8 + (k%9)
  arithmetic agree — pinned directly on a crafted cell array,
- the banded plan stays bucketed (no CartesianProduct / BNLJ).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.multimodal import audiohash
from aliyun_emapreduce_datasources_spark.multimodal.wav import decode_wav


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_banded_plan_never_all_pairs(spark, sf_dir):
    plan = _plan(audiohash.audio_neardup_pairs(spark, sf_dir, materialize=False))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_law_cells_survive_container_roundtrip(spark):
    """Attach → REAL decode → pool recovers the amplitude law exactly
    for every window-length class (40/60/80 samples)."""
    df = spark.range(12).select(F.col("id").alias("doc_id"))
    media = audiohash.attach_wav_group_audio(df, "doc_id")
    rows = media.select("media_id", "payload", "meta").collect()
    for r in rows:
        pcm, sr = decode_wav(bytes(r["payload"]))
        assert sr == audiohash.SR
        win = audiohash._WIN_CHOICES[r["media_id"] % 3]
        assert pcm.shape == (72 * win, 1)
        assert r["meta"]["duration_ms"] == 72 * win * 1000 // audiohash.SR
    out = {
        r["media_id"]: r["cells"]
        for r in audiohash.audio_dhash_cells(media).collect()
    }
    assert len(out) == 12
    for mid, cells in out.items():
        assert cells == audiohash._law_cells(mid).tolist(), mid


def test_hash_comes_from_decoded_bytes(spark):
    """Flipping a PCM sample byte changes the decoded envelope —
    proof the pipeline reads the BYTES, not the law; truncation
    refuses loudly."""
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    row = audiohash.attach_wav_group_audio(df, "doc_id").collect()[0]
    payload = bytearray(row["payload"])
    base, _ = decode_wav(bytes(payload))
    # byte 45 is the high byte of sample 0 (44-byte canonical header)
    payload[45] ^= 0x40
    corrupted, _ = decode_wav(bytes(payload))
    assert corrupted[0, 0] != base[0, 0]
    with pytest.raises(ValueError):
        decode_wav(bytes(payload[:50]))


def test_bit_layout_matches_oracle_arithmetic(spark):
    """Craft a cell array with exactly one gradient set and check
    dhash64 puts it at bit (k//9)*8 + (k%9) — the oracle's formula."""
    for k in (0, 7, 9, 43, 61, 70):  # left cell k, requires k%9 < 8
        cells = [0] * 72
        cells[k + 1] = 1  # single rising gradient at position k
        df = spark.createDataFrame([(1, cells)], "media_id long, cells array<int>")
        h = df.select(audiohash.dhash64(F.col("cells")).alias("h")).collect()[0]["h"]
        expect_bits = {(k // 9) * 8 + (k % 9)}
        # the crafted array also sets the falling edge back to 0 at
        # k+1 -> k+2 only if k+2 exists in the same row — a falling
        # edge never sets a bit (strict >), so exactly one bit is set.
        # Compare unsigned: bit 63 makes the signed long negative.
        assert (h & ((1 << 64) - 1)) == sum(1 << b for b in expect_bits), (
            k,
            bin(h),
        )


def test_neardup_pairs_exist_and_respect_cut(spark, sf_dir):
    docs = (
        audiohash.t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id")
        .limit(120)
    )
    media = audiohash.attach_wav_group_audio(docs, "doc_id")
    fps = audiohash.audio_dhash_cells(media).select(
        "media_id", audiohash.dhash64(F.col("cells")).alias("simhash")
    )
    from aliyun_emapreduce_datasources_spark.dedup.simhash import (
        simhash_candidates,
    )

    pairs = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_candidates(fps, id_col="media_id").collect()
    ]
    assert pairs, "fixture produced no near-dup pairs — vacuous test"
    assert all(h <= audiohash.MAX_HAMMING for _, _, h in pairs)
    # different window-length classes must still match (duration
    # invariance): some pair crosses id%3 classes
    assert any(a % 3 != b % 3 for a, b, _ in pairs)
