"""Perceptual VIDEO near-duplicate detection — the AVI member of the
near-dup family (image → imagehash, mixed containers → mixed, audio →
audiohash), closing the loop: every modality the repo can decode now
feeds the same dedup machinery.

Pipeline (identical 100 TB shape):

1. **Attach (map-side).** Each document gets a GENUINE uncompressed
   RIFF/AVI container (multimodal/avi.py — real hdrl/movi chunk
   layout, BGR bottom-up DIB frames) whose frames follow a
   closed-form md5 luminance law (below). Executor-side synthesis.
2. **Decode + pool (map-side).** The REAL chunk-walk decode recovers
   every frame; mean-pooling the R channel over 72 equal TIME windows
   is exact-integer because the law holds all frames of a window at a
   constant value — per-video frames-per-window vary (the temporal
   resize leg: a re-encoded video at a different frame rate pools to
   the same envelope), so a frame-count, stride, or channel bug lands
   in the cells and hash-mismatches the oracle.
3. **dHash (JVM expression) + banded hamming join** — the same
   64-term OR-chain temporal-gradient hash (imagehash.dhash64 over
   the 72 windows read row-major as 9x8) and the SimHash Manku block
   join at hamming <= 3: exact by pigeonhole, bucketed, never
   all-pairs.

Law (SQL-derivable): groups of 5 (group = id//5, variant = id%5)
share an md5 base envelope; variant v re-paints a window where
u64md5("vpert,g,v,k") % 72 < 2v. Window values are u64md5(...) % 256
(frame luminance); channels carry the (c, c+85, c+170) offsets so a
BGR/RGB swap moves the pooled R cells and is caught.

Reference parity: temporal-envelope video fingerprints follow the
public shot-boundary / temporal-signature family (the same
gradient-sign reduction as the audio entry); the reference repo has
no video operator — beyond-reference LLM-pipeline surface (brief).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup.simhash import simhash_candidates
from aliyun_emapreduce_datasources_spark.multimodal.avi import decode_avi, encode_avi
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
from aliyun_emapreduce_datasources_spark.operators.common import ensure_parallelism, t

__all__ = [
    "attach_avi_group_videos",
    "video_dhash_cells",
    "video_neardup_pairs",
    "QUERY",
    "ORACLE",
]

FPS = 8
FRAME_W, FRAME_H = 16, 8  # 16*3 bytes/row — stride already 4-aligned
_CH_OFF = (0, 85, 170)


def _law_cells(media_id: int) -> np.ndarray:
    """(N_CELLS,) int64 window luminances under the video group/variant
    md5 law (tags vimg/vpert/vpval — disjoint from the other laws)."""
    g, v = media_id // GROUP_SIZE, media_id % GROUP_SIZE
    cells = np.empty(N_CELLS, dtype=np.int64)
    for k in range(N_CELLS):
        if _u64(f"vpert,{g},{v},{k}") % N_CELLS < v * PERT_MULT:
            cells[k] = _u64(f"vpval,{g},{v},{k}") % 256
        else:
            cells[k] = _u64(f"vimg,{g},{k}") % 256
    return cells


def attach_avi_group_videos(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, payload, meta): genuine uncompressed AVI containers —
    72 time windows of id%2+1 frames each, every frame of window k the
    constant law value (R channel; G/B carry the +85/+170 offsets).
    Executor-side synthesis, each row independent."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "meta": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                fpw = mid % 2 + 1
                avi = _synth_avi_row(mid)
                n_frames = N_CELLS * fpw
                out["media_id"].append(mid)
                out["payload"].append(avi)
                out["meta"].append(
                    {
                        "modality": "video",
                        "format": "avi",
                        "width": FRAME_W,
                        "height": FRAME_H,
                        "duration_ms": n_frames * 1000 // FPS,
                        "n_bytes": len(avi),
                        "digest": hashlib.sha256(avi).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, MEDIA_SCHEMA)


def _synth_avi_row(mid: int) -> bytes:
    """One genuine AVI container under the grouped law — the per-row
    synth attach_avi_group_videos and the fused path share."""
    fpw = mid % 2 + 1
    c = _law_cells(mid).repeat(fpw)  # (72*fpw,) frame values
    frames = (
        np.stack([(c + off) % 256 for off in _CH_OFF], axis=-1)[:, None, None, :]
        * np.ones((1, FRAME_H, FRAME_W, 1))
    ).astype(np.uint8)
    return encode_avi(frames, FPS)


def _pool_cells_row(payload: bytes) -> np.ndarray:
    """REAL chunk-walk decode + exact temporal pooling of one
    container — the per-row core video_dhash_cells and the fused path
    share (all refusal checks included)."""
    frames, fps = decode_avi(bytes(payload))
    if fps != FPS:
        raise ValueError(f"video_dhash_cells: fps {fps} != {FPS}")
    n = frames.shape[0]
    if n % N_CELLS:
        raise ValueError(
            f"video_dhash_cells: {n} frames is not a multiple "
            f"of the {N_CELLS}-window envelope grid"
        )
    fpw = n // N_CELLS
    r = frames[:, :, :, 0].astype(np.int64)
    per_win = r.reshape(N_CELLS, fpw * r.shape[1] * r.shape[2])
    return (per_win.sum(axis=1) // per_win.shape[1]).astype(np.int32)


def video_dhash_cells_fused(df: DataFrame, id_col: str) -> DataFrame:
    """attach_avi_group_videos ∘ video_dhash_cells as ONE map pass:
    identical container bytes, decode and refusal checks, but the AVI
    blobs never cross the JVM boundary (r11 optimization round — see
    media.wav_audio_features_fused for the measured GC-coupling
    mechanism the two-stage form pays)."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                ids.append(mid)
                cell_rows.append(_pool_cells_row(_synth_avi_row(mid)))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return src.mapInPandas(run, CELLS_SCHEMA)


def video_dhash_cells(media: DataFrame) -> DataFrame:
    """REAL-decode-only temporal pooling: parse each payload as a
    genuine RIFF/AVI (refuses anything else), mean-pool the R channel
    over 72 equal frame windows (exact integer — every window is
    law-constant). Emits (media_id, cells[72])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                cell_rows.append(_pool_cells_row(payload))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return media.select("media_id", "payload").mapInPandas(run, CELLS_SCHEMA)


def video_neardup_pairs(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(media_a, media_b, hamming): perceptual video near-dup pairs at
    hamming <= 3, same join machinery and persist/checkpoint/release
    discipline as the image and audio twins."""
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id")
    )
    fps_df = video_dhash_cells_fused(docs, "doc_id").select(
        F.col("media_id"), dhash64(F.col("cells")).alias("simhash")
    )
    if materialize:
        fps_df = fps_df.persist()
        fps_df.count()
    result = (
        simhash_candidates(fps_df, id_col="media_id")
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
    fps_df.unpersist()
    return out


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_neardup_pairs(spark, sf_dir)


def _oracle() -> str:
    """Full DuckDB twin over the flat 72-window law — identical
    gradient/packing arithmetic to the audio oracle (bit
    (k//9)*8 + (k%9), gradients within 9-window segments)."""
    u64 = "CAST(('0x' || substr(md5({s}), 1, 16)) AS UBIGINT)"
    base = u64.format(s="'vimg,' || CAST(g AS VARCHAR) || ',' || CAST(k AS VARCHAR)")
    pert_s = (
        "'{tag},' || CAST(g AS VARCHAR) || ',' || CAST(v AS VARCHAR) "
        "|| ',' || CAST(k AS VARCHAR)"
    )
    pert = u64.format(s=pert_s.format(tag="vpert"))
    pval = u64.format(s=pert_s.format(tag="vpval"))
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id // {GROUP_SIZE} AS g,
         doc_id % {GROUP_SIZE} AS v
  FROM documents WHERE text IS NOT NULL
), cells AS MATERIALIZED (
  SELECT media_id, kk.k,
         CASE WHEN {pert} % {N_CELLS} < v * {PERT_MULT}
              THEN CAST({pval} % 256 AS BIGINT)
              ELSE CAST({base} % 256 AS BIGINT) END AS c
  FROM ids, unnest(generate_series(0, {N_CELLS - 1})) AS kk(k)
), hashes AS MATERIALIZED (
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
