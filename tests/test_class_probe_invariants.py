"""Class-probe fixture invariants (r09 verdict ask #8).

Two rounds of churn came from the same silent failure mode: a
phase-shift coefficient scheme colliding under a dimension change —
the mod-7 law made classes 7-9 coefficient-identical to 0-2 (DIM=64
≡ 1 mod 7), and the tau probe degenerated when class-0's
coefficients matched the binary probe's. Both are instances of ONE
invariant breaking: *every class probe must be pairwise-distinct and
argmax-reachable under the (score desc, cls asc) tie-break*.

This suite pins that invariant directly on the shipped fixture AND
proves the detector fires on degenerate geometries (a DIM flip that
re-collides the phases), so a future DIM/N_CLASSES/modulus change
fails loudly here instead of silently degenerating the metrics
again. Pure fixture arithmetic — no Spark session."""

from __future__ import annotations

import numpy as np
import pytest

from aliyun_emapreduce_datasources_spark.similarity import evalmetrics as E


def _coef_class_at_dim(cls: int, dim: int) -> list[int]:
    """The live law with DIM as a parameter (kept in lockstep with
    evalmetrics._coef_class by test_parametrized_law_matches_live)."""
    return [(((cls * dim + i) * E._MIX) % 11) - 5 for i in range(dim)]


def _invariants_hold(dim: int, n_classes: int = E.N_CLASSES) -> bool:
    """True iff all class probes at ``dim`` are pairwise-distinct AND
    every class is argmax-reachable: for each class c there exists a
    witness vector (its own coefficient vector) whose scores make c
    the argmax under the (score desc, cls asc) tie-break."""
    W = np.array(
        [_coef_class_at_dim(c, dim) for c in range(n_classes)], dtype=np.int64
    )
    for a in range(n_classes):
        for b in range(a + 1, n_classes):
            if (W[a] == W[b]).all():
                return False
    G = W @ W.T  # G[k, c] = score of class k on witness c
    for c in range(n_classes):
        for k in range(n_classes):
            if k == c:
                continue
            # tie-break cls asc: a k < c with an EQUAL score wins
            if G[k, c] > G[c, c] or (G[k, c] == G[c, c] and k < c):
                return False
    return True


def test_parametrized_law_matches_live():
    for c in range(E.N_CLASSES):
        assert _coef_class_at_dim(c, E.DIM) == E._coef_class(c), c


def test_shipped_fixture_classes_pairwise_distinct_and_reachable():
    assert _invariants_hold(E.DIM)


def test_binary_probe_distinct_from_every_class_probe():
    """The tau degeneracy (round 9) was class-1's probe being used
    against a binary probe with identical coefficients — pin that the
    binary probe collides with NO class probe."""
    binary = E._coef_binary()
    for c in range(E.N_CLASSES):
        assert E._coef_class(c) != binary, c


@pytest.mark.parametrize("bad_dim", [66, 11, 22, 110])
def test_detector_fires_on_recolliding_dim(bad_dim):
    """Mutation pin: a DIM ≡ 0 (mod 11) re-collides the phases
    (cls·dim ≡ 0 — every class identical), which is exactly the mod-7
    failure shape. The invariant checker must FIRE there, proving the
    shipped-fixture test above is falsifiable, not vacuous."""
    assert not _invariants_hold(bad_dim)


def test_detector_fires_on_modulus_overflow():
    """N_CLASSES > modulus guarantees a collision (pigeonhole) — the
    live guard raises; the parametrized checker agrees."""
    with pytest.raises(ValueError, match="11"):
        orig = E.N_CLASSES
        E.N_CLASSES = 12
        try:
            E._coef_class(0)
        finally:
            E.N_CLASSES = orig


def test_plausible_alternative_dims_mostly_safe_but_checked():
    """Not a guarantee — documentation of the blast radius: common
    embedding widths that keep the invariant (so a width migration
    knows what to re-run) and the recorded-bad ones. If a future
    width lands outside this pin, _invariants_hold is the gate to
    consult BEFORE changing DIM."""
    for dim in (32, 48, 64, 128, 256, 384, 768, 1024, 1536):
        assert _invariants_hold(dim), dim
