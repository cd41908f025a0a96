"""Perceptual image near-duplicate detection (dHash) — the entry that
ties the multimodal codecs to the dedup machinery (round-10 verdict
ask #3).

Pipeline (the 100 TB shape):

1. **Attach (map-side).** Each document gets a GENUINE 24-bit BMP
   container (multimodal/bmp.py — real headers, BGR order, bottom-up
   rows, 4-byte padding) whose pixels follow a closed-form md5 law
   (below), synthesized executor-side — blob bytes never touch the
   driver, every row independent.
2. **Decode + pool (map-side).** The REAL container decode
   (decode_bmp) recovers the pixel plane; average-pooling the R
   channel down to the fixed 9x8 dHash grid is exact-integer because
   the law paints each pooling box a constant value — so a padding
   mis-strip, a BGR/RGB swap, or a row-flip bug lands in the cells and
   hash-mismatches the oracle.
3. **dHash (JVM expression).** The 64 row-gradient comparisons
   (cell[cy, cx+1] > cell[cy, cx]) pack into one BIGINT via a 64-term
   bitwise-OR chain — plain codegen-friendly integer expressions, no
   higher-order functions, no Python.
4. **Banded hamming join (one shuffle).** REUSES the SimHash Manku
   block machinery (dedup/simhash.py): 4 x 16-bit blocks, pairs
   sharing any block are candidates (pigeonhole: hamming <= 3 < 4
   blocks GUARANTEES a shared block, so the banded join is EXACTLY the
   all-pairs result), verified with bit_count(xor). Never all-pairs:
   candidate volume is O(n · blocks) + within-bucket pairs; the law
   keeps buckets constant-sized (5-image groups), and at corpus scale
   cross-group 16-bit collisions stay ~n²/2^16 per block — the same
   block-size/recall trade the SimHash entry documents.

Pixel law (SQL-derivable end to end, the gradient-law pattern of
multimodal/media.py): images come in GROUPS of 5 (group = id//5,
variant = id%5) sharing an md5 base pattern; variant v re-paints a
cell where u64md5("pert,g,v,cy,cx") % 72 < 2v (expected 2v cells), so
low-variant pairs sit within the hamming cut and high-variant pairs
scatter — the oracle re-derives every hash from the law without ever
seeing a container byte, which makes the ENGINE's real decode the
thing under test.

Reference parity: dHash follows the public average/gradient-hash
formulation (pHash family); the reference repo has no image operator —
this is part of the beyond-reference LLM-pipeline surface (brief).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.dedup.simhash import simhash_candidates
from aliyun_emapreduce_datasources_spark.multimodal.bmp import decode_bmp, encode_bmp
from aliyun_emapreduce_datasources_spark.multimodal.media import MEDIA_SCHEMA
from aliyun_emapreduce_datasources_spark.operators.common import ensure_parallelism, t

__all__ = [
    "attach_dhash_group_images",
    "image_dhash_cells",
    "dhash64",
    "image_neardup_pairs",
    "QUERY",
    "ORACLE",
]

GROUP_SIZE = 5
CW, CH = 9, 8  # dHash grid: 9 wide -> 8 gradients per row, 8 rows
N_CELLS = CW * CH
MAX_HAMMING = 3  # with simhash's 4 blocks: exact recall by pigeonhole
# variant v re-paints ~2v of the 72 cells: sweep-picked so within-group
# pairs split ~half kept / half rejected with hamming spread 0-8+ (both
# the keep and the reject path of the cut are exercised at every sf)
PERT_MULT = 2
_CH_OFF = (0, 85, 170)  # distinct channels catch a BGR/RGB swap


def _u64(s: str) -> int:
    """Unsigned 64-bit value named by the first 16 md5 hex chars —
    '0x' || substr(md5(s), 1, 16) in DuckDB (the portable family)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def _law_cells(media_id: int) -> np.ndarray:
    """(CH, CW) int64 cell values under the group/variant md5 law."""
    g, v = media_id // GROUP_SIZE, media_id % GROUP_SIZE
    cells = np.empty((CH, CW), dtype=np.int64)
    for cy in range(CH):
        for cx in range(CW):
            if _u64(f"pert,{g},{v},{cy},{cx}") % N_CELLS < v * PERT_MULT:
                cells[cy, cx] = _u64(f"pval,{g},{v},{cy},{cx}") & 255
            else:
                cells[cy, cx] = _u64(f"img,{g},{cy},{cx}") & 255
    return cells


def attach_dhash_group_images(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, payload, meta): genuine BMP containers whose pixels
    scale the 9x8 law grid up by per-image factors (sx = id%3+1,
    sy = id%2+1) — box-constant pixels, so the decode+pool stage
    recovers the law cells EXACTLY and the SQL oracle never needs to
    model the resize. Executor-side synthesis, each row independent."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "meta": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                sx, sy = mid % 3 + 1, mid % 2 + 1
                bmp = _synth_bmp_row(mid)
                out["media_id"].append(mid)
                out["payload"].append(bmp)
                out["meta"].append(
                    {
                        "modality": "image",
                        "format": "bmp",
                        "width": CW * sx,
                        "height": CH * sy,
                        "duration_ms": 0,
                        "n_bytes": len(bmp),
                        "digest": hashlib.sha256(bmp).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, MEDIA_SCHEMA)


CELLS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("cells", T.ArrayType(T.IntegerType())),
    ]
)


def _synth_bmp_row(mid: int) -> bytes:
    """One genuine BMP container under the grouped law — the per-row
    synth attach_dhash_group_images and the fused path share."""
    sx, sy = mid % 3 + 1, mid % 2 + 1
    c = _law_cells(mid).repeat(sy, axis=0).repeat(sx, axis=1)
    px = np.stack([(c + off) % 256 for off in _CH_OFF], axis=-1).astype(np.uint8)
    return encode_bmp(px)


def _pool_cells_row(payload: bytes) -> np.ndarray:
    """REAL decode + exact 9x8 pooling of one container — the per-row
    core image_dhash_cells and the fused path share."""
    img = decode_bmp(bytes(payload))
    r = img[:, :, 0].astype(np.int64)
    h, w = r.shape
    if h % CH or w % CW:
        raise ValueError(
            f"image_dhash_cells: {w}x{h} is not a multiple of "
            f"the {CW}x{CH} dHash grid"
        )
    sy, sx = h // CH, w // CW
    pooled = r.reshape(CH, sy, CW, sx).sum(axis=(1, 3)) // (sy * sx)
    return pooled.ravel().astype(np.int32)


def image_dhash_cells_fused(df: DataFrame, id_col: str) -> DataFrame:
    """attach_dhash_group_images ∘ image_dhash_cells as ONE map pass:
    identical container bytes and decode, but the BMP blobs never
    cross the JVM boundary (r11 optimization round — the Arrow blob
    churn of the two-stage form is GC-cadence-coupled under heap debt;
    see media.wav_audio_features_fused)."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                ids.append(mid)
                cell_rows.append(_pool_cells_row(_synth_bmp_row(mid)))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return src.mapInPandas(run, CELLS_SCHEMA)


def image_dhash_cells(media: DataFrame) -> DataFrame:
    """REAL-decode-only pooling: parse each payload as a genuine BMP,
    average-pool the R channel to the 9x8 dHash grid (exact integer —
    each box is law-constant; `sum // box` floors identically on both
    sides if a decode bug ever breaks constancy, and then the hash
    mismatch is the point). Emits (media_id, cells[72]) row-major;
    the hash itself stays JVM-side (dhash64)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                cell_rows.append(_pool_cells_row(payload))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return media.select("media_id", "payload").mapInPandas(run, CELLS_SCHEMA)


def dhash64(cells: F.Column) -> F.Column:
    """64-bit gradient hash over a 72-element row-major 9x8 cell array
    as ONE flat integer expression: bit (cy*8 + cx) is set iff
    cell[cy, cx+1] > cell[cy, cx]. A 64-term bitwise-OR chain —
    whole-stage-codegen friendly, no higher-order functions (the
    allocation lesson of the MinHash fold, NOTES_r10.md), and
    shiftleft is ANSI-exempt so bit 63 packs without overflow."""
    terms = []
    for cy in range(CH):
        for cx in range(CW - 1):
            k = cy * (CW - 1) + cx
            bit = cells[cy * CW + cx + 1] > cells[cy * CW + cx]
            terms.append(
                F.when(bit, F.shiftleft(F.lit(1).cast("long"), k)).otherwise(
                    F.lit(0).cast("long")
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def image_neardup_pairs(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(media_a, media_b, hamming): perceptual near-dup image pairs at
    hamming <= 3 over the 64-bit dHash, via the SimHash Manku block
    join (exact at this threshold by pigeonhole — bucketed, never
    all-pairs). ``materialize=False`` keeps the plan lazy for plan
    inspection (tests/test_imagehash.py's never-all-pairs pin)."""
    # project to the id BEFORE spreading partitions — the synthesis
    # stage only needs ids, so the one-file local fixture fans out
    # without shuffling document text
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id")
    )
    # persist the fingerprints: both sides of the block self-join read
    # them, and without the boundary the fused synth+decode MapInPandas
    # runs once PER SIDE; released deterministically once the
    # (tiny) pair result is checkpointed — the r10-ask-#2 pattern the
    # whole pair-dedup family follows (dedup/minhash.py)
    fps = image_dhash_cells_fused(docs, "doc_id").select(
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
    return image_neardup_pairs(spark, sf_dir)


def _signed(u: str) -> str:
    two63 = "(CAST(1 AS HUGEINT) << 63)"
    two64 = "(CAST(1 AS HUGEINT) << 64)"
    return f"CAST({u} - CASE WHEN {u} >= {two63} THEN {two64} ELSE 0 END AS BIGINT)"


def _oracle() -> str:
    """Full DuckDB twin: re-derives every cell from the md5 law (never
    touching a container byte), packs the same 64 gradient bits, and
    takes the ALL-PAIRS hamming join — which the engine's banded join
    equals exactly at this threshold (pigeonhole). All-pairs is
    affordable oracle-side only because the oracle runs at sf0.01."""
    u64 = "CAST(('0x' || substr(md5({s}), 1, 16)) AS UBIGINT)"
    base = u64.format(
        s="'img,' || CAST(g AS VARCHAR) || ',' || CAST(cy AS VARCHAR) "
        "|| ',' || CAST(cx AS VARCHAR)"
    )
    pert_s = (
        "'{tag},' || CAST(g AS VARCHAR) || ',' || CAST(v AS VARCHAR) || ',' "
        "|| CAST(cy AS VARCHAR) || ',' || CAST(cx AS VARCHAR)"
    )
    pert = u64.format(s=pert_s.format(tag="pert"))
    pval = u64.format(s=pert_s.format(tag="pval"))
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id // {GROUP_SIZE} AS g,
         doc_id % {GROUP_SIZE} AS v
  FROM documents WHERE text IS NOT NULL
), cells AS MATERIALIZED (
  SELECT media_id, cy.cy, cx.cx,
         CASE WHEN {pert} % {N_CELLS} < v * {PERT_MULT}
              THEN CAST({pval} & 255 AS BIGINT)
              ELSE CAST({base} & 255 AS BIGINT) END AS c
  FROM ids,
       unnest(generate_series(0, {CH - 1})) AS cy(cy),
       unnest(generate_series(0, {CW - 1})) AS cx(cx)
), hashes AS MATERIALIZED (
  SELECT a.media_id,
         {_signed(f"SUM(CASE WHEN b.c > a.c THEN (CAST(1 AS HUGEINT) << (a.cy * {CW - 1} + a.cx)) ELSE CAST(0 AS HUGEINT) END)")} AS hash
  FROM cells a JOIN cells b
    ON b.media_id = a.media_id AND b.cy = a.cy AND b.cx = a.cx + 1
  WHERE a.cx < {CW - 1}
  GROUP BY a.media_id
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.hash, b.hash)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.hash, b.hash)) <= {MAX_HAMMING}
ORDER BY media_a, media_b
"""


ORACLE = _oracle()
