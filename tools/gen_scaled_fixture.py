#!/usr/bin/env python
"""Generate an sf1-scale fixture (documents / embeddings / events) as
the THIRD scaling point for the work-count curves (round-6 verdict ask
#4: every sub-quadratic pin rested on the single sf0.01→sf0.1 step).

The driver's testdata is read-only and its generator private, so this
reproduces the corpus' observable generative model, FIT to the real
tables and then validated (``--validate``) by generating a same-size
twin of sf0.1 under a fresh seed and comparing measure_work counts —
the honest check that the extrapolated sf1 point measures the same
process and not an artifact of this generator.

Fitted model (measured against /root/testdata/sf0.1, 2026-08):
- documents: base docs are iid uniform tokens over the observed
  30-word vocab, lengths uniform [10, 99]; 5% of docs are NEAR-DUP
  COPIES — a uniformly chosen earlier doc's text + " dup" appended
  (observed: 250/5000 marker docs, marker always final token, 243/250
  stripped-equal to another doc, 'dup dup' chains = copies of copies,
  ~8 exact-dup pairs = birthday collisions of double-picked sources);
  lang ~ {en: .41, de/es/fr/zh: .1475}, source = src{doc_id % 20}.
- embeddings: iid N(0, 0.125²) float32, dim 64 (observed: per-dim
  std .125, 1% quantile ≈ 2.33σ, no planted high-cosine pairs — the
  ≥0.4 tail is the random distribution's own, ~0.05% of pairs);
  label uniform 0..9.
- events: uniform event_type over 5, user uniform over n/66 users,
  value ~ Exp(mean 50) rounded to cents, ts uniform over 30 days
  (event_id in ts order), props = {"k": uniform 0..99}.

Scale steps mirror the driver's: docs ×10, embeddings ×4, events ×10
per sf decade.

Usage:
    python tools/gen_scaled_fixture.py /root/repo/.scaling_sf1 --sf 1
    python tools/gen_scaled_fixture.py /tmp/sim01 --sf 0.1 --seed 7 --validate
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
DUP_RATE = 0.05
DIM = 64
EMB_STD = 0.125
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def gen_documents(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < DUP_RATE:
            texts.append(texts[int(rng.integers(0, i))] + " dup")
        else:
            ln = int(rng.integers(10, 100))
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), ln)))
    langs = [LANGS[j] for j in rng.choice(len(LANGS), n, p=LANG_P)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    vecs = rng.normal(0.0, EMB_STD, (n, DIM)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n).astype(np.int32), pa.int32()),
        }
    )


def gen_events(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 2)
    n_users = max(1, round(n / 66))  # observed 100k events / 1500 users
    start = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, n))
    vals = np.round(rng.exponential(50.0, n), 2)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(start + ts.astype("timedelta64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(
                [EVENT_TYPES[j] for j in rng.integers(0, 5, n)], pa.string()
            ),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)], pa.string()
            ),
        }
    )


def generate(outdir: str, sf: float, seed: int) -> None:
    os.makedirs(outdir, exist_ok=True)
    n_docs = round(50_000 * sf)
    n_emb = round(2000 * (4 ** np.log10(sf * 10)))  # ×4 per decade: sf0.1→2000, sf1→8000
    n_events = round(1_000_000 * sf)
    pq.write_table(gen_documents(n_docs, seed), f"{outdir}/documents.parquet")
    pq.write_table(gen_embeddings(round(n_emb), seed), f"{outdir}/embeddings.parquet")
    pq.write_table(gen_events(n_events, seed), f"{outdir}/events.parquet")
    print(f"wrote {outdir}: docs={n_docs} emb={round(n_emb)} events={n_events}")


def validate(simdir: str) -> None:
    """Compare measure_work counts of a generated sf0.1-size twin
    against the real sf0.1 — per-metric ratio sim/real."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    from scaling_curve import measure_work

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    real = measure_work(spark, "/root/testdata/sf0.1")
    sim = measure_work(spark, simdir)
    out = {
        k: {"real": real[k], "sim": sim[k], "ratio": round(sim[k] / max(real[k], 1), 3)}
        for k in real
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--validate", action="store_true")
    a = ap.parse_args()
    generate(a.outdir, a.sf, a.seed)
    if a.validate:
        validate(a.outdir)
