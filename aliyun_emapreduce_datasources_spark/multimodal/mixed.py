"""Heterogeneous-container image near-dup — magic-byte decode dispatch
over BMP + PNG + JPEG feeding ONE perceptual dHash join.

A real multimodal lake is never one format: the same logical image
arrives as a BMP from one pipeline, a PNG from another, a JPEG from a
third, and near-dup detection has to work ACROSS the container
boundary. This entry is that shape end to end, composing all three
first-principles codecs the repo ships:

1. **Attach (map-side).** Each document synthesizes a genuine
   container chosen by ``id % 3`` — 24-bit BMP (multimodal/bmp.py),
   DEFLATE'd PNG (multimodal/png.py, scanline filters cycling), or
   baseline Huffman-coded JPEG (multimodal/jpeg.py) — whose DECODED
   pixels all follow the SAME even-valued md5 cell law, so two
   near-identical images match regardless of which container each
   landed in. JPEG is lossy in general; the law makes it exact here
   (8x8-aligned constant boxes + even values + flat Q00=16 — the
   integer-exact chain multimodal/media.py documents), which is what
   lets ONE oracle model all three formats.
2. **Decode dispatch + pool (map-side).** The decoder is picked by
   MAGIC BYTES (BM / \\x89PNG / \\xff\\xd8), not by trusted metadata —
   unknown magics are refused loudly. Average-pooling to the 9x8
   dHash grid is exact-integer (box-constant pixels), so a dispatch
   bug, a channel swap, or any codec defect lands in the cells and
   hash-mismatches the oracle.
3. **dHash (JVM expression) + banded hamming join** — identical
   machinery to media_image_neardup (multimodal/imagehash.py): the
   64-term OR-chain hash and the SimHash Manku block join, exact at
   hamming <= 3 by pigeonhole, bucketed, never all-pairs.

Law (SQL-derivable): groups of 5 (group = id//5, variant = id%5)
share an md5 base pattern; variant v re-paints a cell where
u64md5("mpert,g,v,cy,cx") % 72 < 2v. All cell values are
2·(u64md5(...) % 128) — even, so the JPEG leg decodes bit-exactly.
The oracle re-derives every hash from the law without seeing a
container byte; which CONTAINER an id used never appears in the
oracle, because a correct engine makes the container invisible.

Reference parity: the reference repo has no image operator — this is
the beyond-reference LLM-pipeline surface (brief), the cross-format
composition of media_image_neardup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup.simhash import simhash_candidates
from aliyun_emapreduce_datasources_spark.multimodal.bmp import decode_bmp, encode_bmp
from aliyun_emapreduce_datasources_spark.multimodal.imagehash import (
    CELLS_SCHEMA,
    CH,
    CW,
    GROUP_SIZE,
    MAX_HAMMING,
    N_CELLS,
    PERT_MULT,
    _signed,
    _u64,
    dhash64,
)
from aliyun_emapreduce_datasources_spark.multimodal.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from aliyun_emapreduce_datasources_spark.multimodal.media import MEDIA_SCHEMA
from aliyun_emapreduce_datasources_spark.multimodal.png import decode_png, encode_png
from aliyun_emapreduce_datasources_spark.operators.common import ensure_parallelism, t

__all__ = [
    "attach_mixed_group_images",
    "mixed_dhash_cells",
    "mixed_neardup_pairs",
    "QUERY",
    "ORACLE",
]

_FORMATS = ("bmp", "png", "jpeg")
_JPEG_SCALE = 8  # JPEG boxes must tile 8x8 blocks exactly for the law
_JPEG_Q16 = np.full((8, 8), 16, dtype=np.int32)
_CH_OFF = (0, 85, 170)  # RGB legs carry distinct channels (swap probe)


def _law_cells(media_id: int) -> np.ndarray:
    """(CH, CW) int64 EVEN cell values under the mixed group/variant
    md5 law (tags mimg/mpert/mpval — disjoint from imagehash's law so
    the two entries' fixtures never alias)."""
    g, v = media_id // GROUP_SIZE, media_id % GROUP_SIZE
    cells = np.empty((CH, CW), dtype=np.int64)
    for cy in range(CH):
        for cx in range(CW):
            if _u64(f"mpert,{g},{v},{cy},{cx}") % N_CELLS < v * PERT_MULT:
                cells[cy, cx] = 2 * (_u64(f"mpval,{g},{v},{cy},{cx}") % 128)
            else:
                cells[cy, cx] = 2 * (_u64(f"mimg,{g},{cy},{cx}") % 128)
    return cells


def attach_mixed_group_images(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, payload, meta): container format picked by id % 3 —
    BMP / PNG / JPEG, all genuine, all decoding to the SAME law cells.
    BMP and PNG scale the 9x8 grid by per-image factors (sx = id%3+1,
    sy = id%2+1) and carry the 3-channel offsets; JPEG scales by 8x8
    (block-aligned constant boxes → integer-exact lossy chain) and is
    grayscale (a color JPEG would reintroduce YCbCr rounding).
    Executor-side synthesis, each row independent."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "meta": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                fmt = _FORMATS[mid % 3]
                blob = _synth_mixed_row(mid)
                if fmt == "jpeg":
                    w, h = CW * _JPEG_SCALE, CH * _JPEG_SCALE
                else:
                    w, h = CW * (mid % 3 + 1), CH * (mid % 2 + 1)
                out["media_id"].append(mid)
                out["payload"].append(blob)
                out["meta"].append(
                    {
                        "modality": "image",
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "duration_ms": 0,
                        "n_bytes": len(blob),
                        "digest": hashlib.sha256(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, MEDIA_SCHEMA)


def _synth_mixed_row(mid: int) -> bytes:
    """One genuine container (BMP/PNG/JPEG by id % 3) under the shared
    law — the per-row synth attach_mixed_group_images and the fused
    path share."""
    fmt = _FORMATS[mid % 3]
    cells = _law_cells(mid)
    if fmt == "jpeg":
        px = (
            cells.repeat(_JPEG_SCALE, axis=0)
            .repeat(_JPEG_SCALE, axis=1)
            .astype(np.uint8)
        )
        return encode_jpeg(
            px, quant_luma=_JPEG_Q16, restart_interval=3 if mid % 2 else 0
        )
    sx, sy = mid % 3 + 1, mid % 2 + 1
    c = cells.repeat(sy, axis=0).repeat(sx, axis=1)
    px = np.stack([(c + off) % 256 for off in _CH_OFF], axis=-1).astype(np.uint8)
    if fmt == "bmp":
        return encode_bmp(px)
    return encode_png(px, [y % 5 for y in range(px.shape[0])])


def _decode_any(blob: bytes) -> np.ndarray:
    """MAGIC-BYTE dispatch — the real-lake posture: the payload says
    what it is, metadata is not trusted, unknown magics are refused
    loudly with the sniffed prefix named."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    raise ValueError(
        f"mixed decode: unknown container magic {blob[:8]!r}"
    )


def _pool_cells_row(payload: bytes) -> np.ndarray:
    """Magic-dispatch REAL decode + exact 9x8 pooling of one container
    — the per-row core mixed_dhash_cells and the fused path share."""
    img = _decode_any(bytes(payload))
    plane = (img[:, :, 0] if img.ndim == 3 else img).astype(np.int64)
    h, w = plane.shape
    if h % CH or w % CW:
        raise ValueError(
            f"mixed_dhash_cells: {w}x{h} is not a multiple of "
            f"the {CW}x{CH} dHash grid"
        )
    sy, sx = h // CH, w // CW
    pooled = plane.reshape(CH, sy, CW, sx).sum(axis=(1, 3)) // (sy * sx)
    return pooled.ravel().astype(np.int32)


def mixed_dhash_cells_fused(df: DataFrame, id_col: str) -> DataFrame:
    """attach_mixed_group_images ∘ mixed_dhash_cells as ONE map pass:
    identical container bytes, magic-byte dispatch and decode, but the
    blobs never cross the JVM boundary (r11 optimization round — see
    media.wav_audio_features_fused for the measured GC-coupling
    mechanism)."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                ids.append(mid)
                cell_rows.append(_pool_cells_row(_synth_mixed_row(mid)))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return src.mapInPandas(run, CELLS_SCHEMA)


def mixed_dhash_cells(media: DataFrame) -> DataFrame:
    """REAL-decode-only pooling behind the magic dispatch: whichever
    codec the payload selects, take the first channel (R for the RGB
    legs, the gray plane for JPEG — the law puts the cell value there
    in all three), average-pool to the 9x8 grid (exact integer — every
    pooling box is law-constant in every format)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_rows = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                cell_rows.append(_pool_cells_row(payload))
            yield pd.DataFrame({"media_id": ids, "cells": cell_rows})

    return media.select("media_id", "payload").mapInPandas(run, CELLS_SCHEMA)


def mixed_neardup_pairs(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(media_a, media_b, hamming): cross-container perceptual near-dup
    pairs at hamming <= 3, same join machinery and same persist /
    checkpoint / release discipline as image_neardup_pairs
    (multimodal/imagehash.py — the r10-ask-#2 pattern)."""
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id")
    )
    fps = mixed_dhash_cells_fused(docs, "doc_id").select(
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
    return mixed_neardup_pairs(spark, sf_dir)


def _oracle() -> str:
    """Full DuckDB twin of the MIXED law: identical structure to
    imagehash._oracle but over the mimg/mpert/mpval tags with the
    even-value rule. Deliberately FORMAT-BLIND — no trace of id % 3
    appears, because a correct engine decodes every container to the
    same cells; any format-dependent defect (a lossy JPEG mismatch, a
    PNG filter bug, a dispatch slip) breaks exactly that invariant and
    hash-mismatches."""
    u64 = "CAST(('0x' || substr(md5({s}), 1, 16)) AS UBIGINT)"
    base = u64.format(
        s="'mimg,' || CAST(g AS VARCHAR) || ',' || CAST(cy AS VARCHAR) "
        "|| ',' || CAST(cx AS VARCHAR)"
    )
    pert_s = (
        "'{tag},' || CAST(g AS VARCHAR) || ',' || CAST(v AS VARCHAR) || ',' "
        "|| CAST(cy AS VARCHAR) || ',' || CAST(cx AS VARCHAR)"
    )
    pert = u64.format(s=pert_s.format(tag="mpert"))
    pval = u64.format(s=pert_s.format(tag="mpval"))
    return f"""
WITH ids AS (
  SELECT doc_id AS media_id, doc_id // {GROUP_SIZE} AS g,
         doc_id % {GROUP_SIZE} AS v
  FROM documents WHERE text IS NOT NULL
), cells AS MATERIALIZED (
  SELECT media_id, cy.cy, cx.cx,
         CASE WHEN {pert} % {N_CELLS} < v * {PERT_MULT}
              THEN CAST(2 * ({pval} % 128) AS BIGINT)
              ELSE CAST(2 * ({base} % 128) AS BIGINT) END AS c
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
