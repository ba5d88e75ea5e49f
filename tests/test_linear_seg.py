"""Linear segmentation: A/B the reference's three interchangeable variants
(SURVEY §4.6 cross-validation pattern; Training.cpp:257,350,429).

The full-DP variant (precomputed means, Training.cpp:257-348) and the
running-sums variant (:350-425) minimize the same unnormalized-variance
objective through different rounding paths — their boundaries must agree
on real data. The 3-iteration approximation (:429-510) is a heuristic:
it must land on boundaries whose objective is within a small factor of
the exact optimum.
"""

import numpy as np
import pytest

from speechrecognition_tpu.align.linear_seg import (
    _prefix_sums, _segment_scores, linear_segmentation_approximation,
    linear_segmentation_full_dp, linear_segmentation_running_sums)


def _objective(energy, b1, b2):
    """Total 3-segment unnormalized variance (f64, running-sums form)."""
    cost, sq = _prefix_sums(energy)
    N = energy.shape[0]
    n = np.asarray([b1, b2, N - 1])
    b = np.asarray([1, b1 + 1, b2 + 1])
    return float(_segment_scores(cost, sq, b, n).sum())


def test_full_dp_equals_running_sums_on_demo(demo_corpus):
    """With the [N−1][N−1] mean repaired (next_energy = the true last
    energy), the two exact DPs must pick identical boundaries; with the
    default they may only diverge through the reference's one-past-the-end
    read (Training.cpp:301), which mis-scores a single-frame final
    segment."""
    mismatch = []
    quirk_only = []
    for s in range(demo_corpus.num_segments):
        energy = demo_corpus.feature_sequence(s)[:, 0]
        a = linear_segmentation_running_sums(energy)
        repaired = linear_segmentation_full_dp(
            energy, next_energy=float(energy[-1]))
        if a != repaired:
            oa = _objective(energy, *a)
            ob = _objective(energy, *repaired)
            if abs(oa - ob) > 1e-3 * max(1.0, abs(oa)):
                mismatch.append((s, a, repaired, oa, ob))
        b = linear_segmentation_full_dp(energy)
        if a != b and a[1] != energy.shape[0] - 2:
            quirk_only.append((s, a, b))
    assert not mismatch, mismatch[:5]
    assert not quirk_only, quirk_only[:5]


def test_approximation_near_optimal_on_demo(demo_corpus):
    worse = []
    for s in range(demo_corpus.num_segments):
        energy = demo_corpus.feature_sequence(s)[:, 0]
        exact = linear_segmentation_running_sums(energy)
        approx = linear_segmentation_approximation(energy)
        oe = _objective(energy, *exact)
        oa = _objective(energy, *approx)
        # coordinate descent can stop in a local optimum, but on the demo
        # utterances it stays within 50% of the exact DP objective
        if oa > oe * 1.5 + 1e-6:
            worse.append((s, exact, approx, oe, oa))
    assert not worse, worse[:5]


def test_full_dp_next_energy_quirk():
    """segment_means[N-1][N-1] comes from one past the segment
    (Training.cpp:301): a huge next_energy poisons only DP entries whose
    last segment is the single frame N-1."""
    rng = np.random.default_rng(11)
    energy = rng.random(60).astype(np.float32) * 0.2
    # craft a trailing spike so the optimum wants b2 = N-2
    energy[-1] = 5.0
    clean = linear_segmentation_full_dp(energy, next_energy=0.0)
    poisoned = linear_segmentation_full_dp(energy, next_energy=1e6)
    # both must be valid orderings; the poisoned run may only differ by
    # avoiding the single-frame final segment
    for b1, b2 in (clean, poisoned):
        assert 0 < b1 < b2 < energy.shape[0]
    if clean != poisoned:
        assert clean[1] == energy.shape[0] - 2
