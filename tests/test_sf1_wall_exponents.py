"""Pin the WALL-CLOCK exponent budget (r07 ask #2, regenerated at the
round-11 HEAD per the same freshness rule r09/r10 applied): the full
217-entry catalog benchmarked at the sf1 fixture vs the sf0.1
baseline, per-entry exponents in
bench_history/r11_sf1_exponents.json. Each end of the r11 record is
the per-entry MIN over three sweeps (r11a/b/c at sf0.1, r11_sf1/b/c
at the fixture) — contamination only ever adds time, so min-of-N is
the honest estimator (NOTES_r09.md established the protocol;
NOTES_r10/r11 document the ambient bands). All six sweeps ran ONE
code state (the first-cut bucket cap) at BOTH ends, so every pinned
exponent compares like with like; the post-sweep window-form cap
rewrite changed only the minhash family's constant, not its slope —
at-HEAD probes at both scale ends agree within noise (NOTES_r11.md
"Post-sweep window-cap probes").

The contract this suite pins — the same pattern as
test_scaling_curve.py's work-metric pins:

- every top-20-heaviest entry's time exponent stays ≤ 1.3 over its
  dominant input's scale step,
- EXCEPT the two adjudicated embedding-LSH entries, whose exponent is
  the recall contract's table growth (auto_tables 16→66 at the ×4
  embeddings step — NOTES_r08.md), budgeted at ≤ 1.55 since round 9.
  At the round-11 HEAD they land 1.426 / 1.507 — inside the round-9
  budget (r10: 1.517 / 1.344), no raise needed. The environment-free
  work-metric exponents (scaling_r07.json) are unchanged,
- and no entry anywhere in the catalog exceeds 1.55.

If a future round regenerates the record with worse numbers, this
fails and the regression must be re-adjudicated, not silently
re-recorded."""

from __future__ import annotations

import json

import pytest

_REC = "/root/repo/bench_history/r11_sf1_exponents.json"

# explained in bench_history/NOTES_r08.md (cause) + NOTES_r09.md
# (environment re-adjudication) + NOTES_r10.md (portable-law re-check):
# auto_planes 3→5 pushes auto_tables 16→66 at the ×4 embeddings step —
# LSH's n^(1+ρ) recall cost, not a plan defect
ADJUDICATED = {"dedup_embedding_cosine", "dedup_embedding_lsh_precision_check"}
ADJUDICATED_CAP = 1.55


@pytest.fixture(scope="module")
def rec():
    with open(_REC) as f:
        return json.load(f)


def test_record_covers_catalog(rec):
    assert len(rec["entries"]) >= 210


def test_top20_exponent_budget(rec):
    for name, row in rec["top20_heaviest_sf1"].items():
        e = row["time_exponent"]
        if e is None:
            continue
        cap = ADJUDICATED_CAP if name in ADJUDICATED else 1.3
        assert e <= cap, (name, e, cap)


def test_no_entry_exceeds_adjudicated_ceiling(rec):
    for name, row in rec["entries"].items():
        e = row["time_exponent"]
        if e is not None:
            assert e <= ADJUDICATED_CAP, (name, e)


def test_flagged_set_is_exactly_the_adjudicated_set(rec):
    flagged = {f[0] for f in rec["flagged_over_1.3"]}
    assert flagged == ADJUDICATED


def test_catalog_total_ratio_bounded(rec):
    """Mixed 10x/4x/1x input step: the pinned record's
    intersection-only totals give ~3.12x at the r11 HEAD (r10: 2.85x,
    r09: 3.43x) — pin it under 4x so a broad regression (or a silent
    fixture change) surfaces here. The ratio is derived from the
    record, not hand-copied (r09 ADVICE: a hand-copied 3.52x from the
    pre-intersection totals went stale silently)."""
    ratio = rec["total_sf1_s"] / rec["total_sf0.1_s"]
    assert ratio < 4.0, ratio
