"""Perceptual AUDIO near-duplicate detection — the WAV twin of the
image dHash entry (multimodal/imagehash.py), completing the
multimodal↔dedup bridge for a second modality.

Pipeline (the 100 TB shape, same machinery end to end):

1. **Attach (map-side).** Each document gets a GENUINE RIFF/WAVE
   container (multimodal/wav.py — real 44-byte canonical header,
   chunk-walked PCM16) whose samples follow a closed-form md5
   amplitude law (below), synthesized executor-side — blob bytes
   never touch the driver.
2. **Decode + pool (map-side).** The REAL chunk-walking decode
   recovers the PCM; mean-pooling over 72 equal time windows is
   exact-integer because the law holds each window at a constant
   amplitude — per-image window LENGTHS vary (the audio twin of the
   resize leg), so a sample-count or stride bug lands in the cells
   and hash-mismatches the oracle.
3. **dHash (JVM expression).** The SAME 64-term OR-chain gradient
   hash as images (imagehash.dhash64) — the 72 windows read as the
   9x8 grid row-major, so bit k compares consecutive TIME windows
   within each 9-window segment. No Python in the hash.
4. **Banded hamming join (one shuffle).** The SimHash Manku block
   join at hamming <= 3 — exact by pigeonhole, bucketed, never
   all-pairs.

Amplitude law (SQL-derivable): groups of 5 (group = id//5, variant =
id%5) share an md5 base envelope; variant v re-paints a window where
u64md5("apert,g,v,k") % 72 < 2v, exactly the imagehash perturbation
geometry. Window amplitudes are u64md5(...) % 32768 — non-negative
int16, constant within a window, so the pooled mean is the amplitude
itself and the oracle re-derives every hash without seeing a
container byte.

Reference parity: gradient-hash audio fingerprints follow the public
perceptual-hash family (the spectral-flux / energy-delta sign
fingerprint of the Haitsma–Kalker school, reduced to the time
envelope); the reference repo has no audio operator — this is the
beyond-reference LLM-pipeline surface (brief).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup.simhash import simhash_candidates
from aliyun_emapreduce_datasources_spark.multimodal.imagehash import (
    CELLS_SCHEMA,
    GROUP_SIZE,
    MAX_HAMMING,
    N_CELLS,
    PERT_MULT,
    _signed,
    _u64,
    dhash64,
)
from aliyun_emapreduce_datasources_spark.multimodal.media import MEDIA_SCHEMA
from aliyun_emapreduce_datasources_spark.multimodal.wav import decode_wav, encode_wav
from aliyun_emapreduce_datasources_spark.operators.common import ensure_parallelism, t

__all__ = [
    "attach_wav_group_audio",
    "audio_dhash_cells",
    "audio_neardup_pairs",
    "QUERY",
    "ORACLE",
]

SR = 16000
# per-id window length in samples: the audio "resize" leg — containers
# differ in duration but pool to the same 72 envelope windows
_WIN_CHOICES = (40, 60, 80)


def _law_cells(media_id: int) -> np.ndarray:
    """(N_CELLS,) int64 window amplitudes under the audio group/variant
    md5 law (tags aimg/apert/apval — disjoint from the image laws)."""
    g, v = media_id // GROUP_SIZE, media_id % GROUP_SIZE
    cells = np.empty(N_CELLS, dtype=np.int64)
    for k in range(N_CELLS):
        if _u64(f"apert,{g},{v},{k}") % N_CELLS < v * PERT_MULT:
            cells[k] = _u64(f"apval,{g},{v},{k}") % 32768
        else:
            cells[k] = _u64(f"aimg,{g},{k}") % 32768
    return cells


def _synth_wav_row(mid: int) -> bytes:
    """One genuine mono PCM16 WAV container under the 72-window law —
    the per-row synth attach_wav_group_audio and the fused
    synth+decode path share."""
    win = _WIN_CHOICES[mid % 3]
    pcm = _law_cells(mid).repeat(win).astype(np.int16)
    return encode_wav(pcm, SR)


def _pool_cells_row(payload: bytes) -> np.ndarray:
    """REAL chunk-walk decode + exact 72-window envelope pooling of
    one container — the per-row core audio_dhash_cells and the fused
    path share (all refusal checks included)."""
    pcm, sr = decode_wav(bytes(payload))
    if sr != SR:
        raise ValueError(f"audio_dhash_cells: sample rate {sr} != {SR}")
    if pcm.shape[1] != 1:
        raise ValueError(
            f"audio_dhash_cells: {pcm.shape[1]} channels, want mono"
        )
    mono = pcm[:, 0].astype(np.int64)
    n = mono.shape[0]
    if n % N_CELLS:
        raise ValueError(
            f"audio_dhash_cells: {n} samples is not a multiple "
            f"of the {N_CELLS}-window envelope grid"
        )
    win = n // N_CELLS
    return (mono.reshape(N_CELLS, win).sum(axis=1) // win).astype(np.int32)


def audio_dhash_cells_fused(df: DataFrame, id_col: str) -> DataFrame:
    """attach_wav_group_audio ∘ audio_dhash_cells as ONE map pass:
    each row synthesizes its genuine WAV container and immediately
    decodes + pools it — identical bytes, identical refusal checks,
    identical cells, but the PCM blobs never cross the JVM boundary.
    (r11 optimization round: the two-stage form's Arrow blob churn
    made the entry GC-cadence-coupled — see
    media.wav_audio_features_fused for the measured mechanism.)"""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                cells = _pool_cells_row(_synth_wav_row(mid))
                ids.append(mid)
                cell_rows.append(cells)
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return src.mapInPandas(run, CELLS_SCHEMA)


def attach_wav_group_audio(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, payload, meta): genuine mono PCM16 WAV containers
    holding the 72-window amplitude law, window length id%3-dependent
    (40/60/80 samples). Executor-side synthesis, each row
    independent."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "meta": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                wav = _synth_wav_row(mid)
                n_pcm = len(wav[44:]) // 2  # PCM16 payload samples
                out["media_id"].append(mid)
                out["payload"].append(wav)
                out["meta"].append(
                    {
                        "modality": "audio",
                        "format": "wav",
                        "width": 0,
                        "height": 0,
                        "duration_ms": n_pcm * 1000 // SR,
                        "n_bytes": len(wav),
                        "digest": hashlib.sha256(wav).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, MEDIA_SCHEMA)


def audio_dhash_cells(media: DataFrame) -> DataFrame:
    """REAL-decode-only envelope pooling: parse each payload as a
    genuine RIFF/WAVE (chunk walk, PCM16 — refuses anything else),
    mean-pool the mono samples over 72 equal windows (exact integer —
    each window is law-constant; `sum // win` floors identically on
    both sides if a decode bug ever breaks constancy, and then the
    hash mismatch is the point). Emits (media_id, cells[72])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm, sr = decode_wav(bytes(payload))
                if sr != SR:
                    raise ValueError(
                        f"audio_dhash_cells: sample rate {sr} != {SR}"
                    )
                if pcm.shape[1] != 1:
                    raise ValueError(
                        f"audio_dhash_cells: {pcm.shape[1]} channels, want mono"
                    )
                mono = pcm[:, 0].astype(np.int64)
                n = mono.shape[0]
                if n % N_CELLS:
                    raise ValueError(
                        f"audio_dhash_cells: {n} samples is not a multiple "
                        f"of the {N_CELLS}-window envelope grid"
                    )
                win = n // N_CELLS
                pooled = mono.reshape(N_CELLS, win).sum(axis=1) // win
                ids.append(int(mid))
                cell_rows.append(pooled.astype(np.int32))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return media.select("media_id", "payload").mapInPandas(run, CELLS_SCHEMA)


def audio_neardup_pairs(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(media_a, media_b, hamming): perceptual audio near-dup pairs at
    hamming <= 3, same join machinery and the same persist /
    checkpoint / release discipline as image_neardup_pairs."""
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id")
    )
    fps = audio_dhash_cells_fused(docs, "doc_id").select(
        F.col("media_id"), dhash64(F.col("cells")).alias("simhash")
    )
    if materialize:
        fps = fps.persist()
        fps.count()
    result = (
        simhash_candidates(fps, id_col="media_id")
        .select(
            F.col("doc_a").alias("media_a"),
            F.col("doc_b").alias("media_b"),
            "hamming",
        )
        .orderBy("media_a", "media_b")
    )
    if not materialize:
        return result
    out = result.persist()  # r12: CacheManager-managed result
    out.count()  # materialize now so the fingerprint cache can drop
    fps.unpersist()
    return out


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_neardup_pairs(spark, sf_dir)


def _oracle() -> str:
    """Full DuckDB twin over the flat 72-window law: identical
    gradient/packing structure to the image oracles (bit k compares
    window k+1 vs k within each 9-window segment — the same row-major
    9x8 read of the cell array dhash64 uses)."""
    u64 = "CAST(('0x' || substr(md5({s}), 1, 16)) AS UBIGINT)"
    base = u64.format(s="'aimg,' || CAST(g AS VARCHAR) || ',' || CAST(k AS VARCHAR)")
    pert_s = (
        "'{tag},' || CAST(g AS VARCHAR) || ',' || CAST(v AS VARCHAR) "
        "|| ',' || CAST(k AS VARCHAR)"
    )
    pert = u64.format(s=pert_s.format(tag="apert"))
    pval = u64.format(s=pert_s.format(tag="apval"))
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id // {GROUP_SIZE} AS g,
         doc_id % {GROUP_SIZE} AS v
  FROM documents WHERE text IS NOT NULL
), cells AS MATERIALIZED (
  SELECT media_id, kk.k,
         CASE WHEN {pert} % {N_CELLS} < v * {PERT_MULT}
              THEN CAST({pval} % 32768 AS BIGINT)
              ELSE CAST({base} % 32768 AS BIGINT) END AS c
  FROM ids, unnest(generate_series(0, {N_CELLS - 1})) AS kk(k)
), hashes AS MATERIALIZED (
  -- bit (k // 9)*8 + (k %% 9): gradients within 9-window segments,
  -- exactly dhash64's row-major 9x8 read
  SELECT a.media_id,
         {_signed(f"SUM(CASE WHEN b.c > a.c THEN (CAST(1 AS HUGEINT) << ((a.k // 9) * 8 + (a.k % 9))) ELSE CAST(0 AS HUGEINT) END)")} AS hash
  FROM cells a JOIN cells b
    ON b.media_id = a.media_id AND b.k = a.k + 1
  WHERE a.k % 9 < 8
  GROUP BY a.media_id
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.hash, b.hash)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.hash, b.hash)) <= {MAX_HAMMING}
ORDER BY media_a, media_b
"""


ORACLE = _oracle()
