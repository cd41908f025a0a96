#!/usr/bin/env python
"""Build bench_history/r{N}_sf1_exponents.json from two idle
BENCH_DETAIL.json runs (sf0.1 baseline + the .bench_sf1 combined
fixture) — the record tests/test_sf1_wall_exponents.py pins.

Usage:
    python tools/sf1_exponents.py <sf0.1_detail.json[,more,...]> \
        <sf1_detail.json[,more,...]> <out.json> [<prior_exponents.json>]

Each end accepts a comma-separated list of detail files from REPEATED
idle sweeps; per-entry times are the MINIMUM across the runs. Min is
the honest wall-clock estimator here because every contamination
channel (ambient container load, cross-entry heap debt, python-worker
RSS bloat) only ever ADDS time — measured in r09 as a ±30 % JVM-entry
band and up to 5x single-entry spikes between back-to-back idle
sweeps (bench_history/NOTES_r09.md).

Per-entry scale attribution (dominant input family) is inherited from
the prior record when given (r08_sf1_exponents.json), else derived
from the FAMILY_PREFIX table below — the sf1 fixture steps documents/
events ×10, embeddings ×4, and leaves the TPC-H tables unchanged (×1,
exponent undefined). time_exponent = log(t_sf1/t_sf0.1) / log(scale).
"""

from __future__ import annotations

import json
import math
import sys

# fallback attribution for entries absent from the prior record: by
# catalog naming convention, then specific overrides
FAMILY_PREFIX = [
    ("dedup_embedding", "embeddings"),
    ("emb_", "embeddings"),
    ("ann_", "embeddings"),
    ("eval_", "embeddings"),
    ("events_", "events"),
    ("seasonality", "events"),
    ("dedup_", "documents"),
    ("text_", "documents"),
    ("media_", "documents"),
    ("lm_", "documents"),
    ("bpe_", "documents"),
    ("doc_", "documents"),
    ("chunk_", "documents"),
    ("rag_", "documents"),
    ("curate_", "documents"),
    ("hybrid_", "documents"),
    ("bm25_", "documents"),
    ("stable_", "documents"),
    ("split_", "documents"),
    ("pack_", "documents"),
    ("mix_", "documents"),
    ("dsir_", "documents"),
    ("batch_plan_", "documents"),
    ("sketch_", "documents"),
    ("graph_", "documents"),
    ("dts_", "documents"),
    ("distinct_users", "events"),
    ("audit_token_gini", "documents"),
]
SCALE = {
    "documents": 10.0,
    "events": 10.0,
    "embeddings": 4.0,
    "tpch": 1.0,
    # the r08 record's label for unchanged-input entries
    "tpch/static": 1.0,
}


def _family(name: str, prior: dict) -> tuple[str, bool]:
    """(family, fell_back): fell_back=True means the name matched
    neither the prior record nor any prefix — it lands in the
    exponent-exempt 'tpch' bucket, which the record must SAY (a
    silently unexponented entry escapes every budget test)."""
    if name in prior:
        return prior[name]["family"], False
    for pre, fam in FAMILY_PREFIX:
        if name.startswith(pre):
            return fam, False
    return "tpch", True


def _min_queries(paths: str) -> dict:
    """Per-entry min across the comma-separated detail files."""
    merged: dict[str, float] = {}
    for p in paths.split(","):
        q = json.load(open(p))["queries"]
        for name, t in q.items():
            if name not in merged or t < merged[name]:
                merged[name] = t
    return merged


def main() -> None:
    base_p, sf1_p, out_p = sys.argv[1], sys.argv[2], sys.argv[3]
    prior = {}
    if len(sys.argv) > 4:
        prior = json.load(open(sys.argv[4]))["entries"]
    b_q = _min_queries(base_p)
    s_q = _min_queries(sf1_p)

    entries = {}
    dropped = sorted(set(s_q) ^ set(b_q))  # in one end only — excluded
    fallbacks = []
    for name in sorted(s_q):
        if name not in b_q:
            continue
        fam, fell_back = _family(name, prior)
        if fell_back:
            fallbacks.append(name)
        scale = SCALE[fam]
        t0, t1 = b_q[name], s_q[name]
        ratio = round(t1 / t0, 3) if t0 > 0 else None
        if scale > 1.0 and t0 > 0 and t1 > 0:
            exp = round(math.log(t1 / t0) / math.log(scale), 3)
        else:
            exp = None
        entries[name] = {
            "sf0.1_s": t0,
            "sf1_s": t1,
            "scale": scale,
            "family": fam,
            "ratio": ratio,
            "time_exponent": exp,
        }

    top20 = dict(
        sorted(entries.items(), key=lambda kv: -kv[1]["sf1_s"])[:20]
    )
    flagged = sorted(
        (
            [n, r["time_exponent"], r["ratio"]]
            for n, r in entries.items()
            if r["time_exponent"] is not None and r["time_exponent"] > 1.3
        ),
        key=lambda f: -f[1],
    )
    rec = {
        "comment": (
            "per-entry wall-time exponents sf0.1 (idle) -> sf1 fixture "
            "(idle), regenerated at the round HEAD (r08 verdict ask #3). "
            "Each end is the per-entry MIN over repeated idle sweeps "
            "(contamination only adds time; see tool docstring + the "
            "round's NOTES). Scale attribution = dominant input family "
            "(documents/events x10 rows, embeddings x4, tpch tables "
            "unchanged x1). Entries over exponent 1.3 adjudicated in "
            "the round's bench_history/NOTES file."
        ),
        # both totals over the SAME entry set (the intersection the
        # exponents cover) — summing every sf1 entry against an
        # intersection-only baseline skews the pinned <4x ratio
        # whenever the two sweeps' catalogs differ
        "total_sf1_s": round(sum(s_q[n] for n in entries), 2),
        "total_sf0.1_s": round(sum(b_q[n] for n in entries), 2),
        # no silent caps: entries excluded (present in only one end)
        # or attributed by fallback to the exponent-exempt tpch bucket
        # are recorded, not dropped invisibly
        "excluded_one_end_only": dropped,
        "family_fallback_tpch": fallbacks,
        "flagged_over_1.3": flagged,
        "top20_heaviest_sf1": top20,
        "entries": entries,
    }
    with open(out_p, "w") as f:
        json.dump(rec, f, indent=1)
    print(
        f"{out_p}: {len(entries)} entries, total {rec['total_sf1_s']}s "
        f"vs {rec['total_sf0.1_s']}s, flagged {[f[0] for f in flagged]}"
    )


if __name__ == "__main__":
    main()
