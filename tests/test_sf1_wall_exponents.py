"""Pin the round-8 WALL-CLOCK exponent budget (verdict ask #2): the
full 213-entry catalog was benchmarked idle at the sf1 fixture
(bench_history/r08_sf1.json, per-entry exponents vs the sf0.1 idle
baseline in r08_sf1_exponents.json). The contract this suite pins —
the same pattern as test_scaling_curve.py's work-metric pins — is:

- every top-20-heaviest entry's time exponent stays ≤ 1.3 over its
  dominant input's scale step,
- EXCEPT the two adjudicated embedding-LSH entries, whose exponent is
  the recall contract's table growth (NOTES_r08.md) and is budgeted
  at ≤ 1.45,
- and no entry anywhere in the catalog exceeds 1.45.

If a future round regenerates the record with worse numbers, this
fails and the regression must be re-adjudicated, not silently
re-recorded."""

from __future__ import annotations

import json

import pytest

_REC = "/root/repo/bench_history/r08_sf1_exponents.json"

# explained in bench_history/NOTES_r08.md: auto_planes 3→5 pushes
# auto_tables 16→66 at the ×4 embeddings step — LSH's n^(1+ρ) recall
# cost, not a plan defect
ADJUDICATED = {"dedup_embedding_cosine", "dedup_embedding_lsh_precision_check"}


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
        cap = 1.45 if name in ADJUDICATED else 1.3
        assert e <= cap, (name, e, cap)


def test_no_entry_exceeds_adjudicated_ceiling(rec):
    for name, row in rec["entries"].items():
        e = row["time_exponent"]
        if e is not None:
            assert e <= 1.45, (name, e)


def test_flagged_set_is_exactly_the_adjudicated_set(rec):
    flagged = {f[0] for f in rec["flagged_over_1.3"]}
    assert flagged == ADJUDICATED


def test_catalog_total_ratio_bounded(rec):
    """Mixed 10x/4x/1x input step: the whole catalog's wall-clock grew
    3.27x — pin it under 4x so a broad regression (or a silent
    fixture change) surfaces here."""
    assert rec["total_sf1_s"] / rec["total_sf0.1_s"] < 4.0
