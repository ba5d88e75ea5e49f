"""BIC segment clustering (Signal/SegmentClustering.cc parity)."""

import numpy as np

from speechrecognition_tpu.sprint.segment_clustering import (
    ClusterResult, GaussianStats, bic_penalty, cluster_segments,
    _pairwise_glr)


def _segments(rng, mean, n_seg, frames=120, dim=6, scale=1.0):
    return [rng.randn(frames, dim) * scale + mean for _ in range(n_seg)]


def test_merge_equals_joint_stats():
    rng = np.random.RandomState(0)
    a, b = rng.randn(50, 4), rng.randn(70, 4)
    m = GaussianStats.from_features(a).merge(GaussianStats.from_features(b))
    joint = GaussianStats.from_features(np.vstack([a, b]))
    assert m.n == joint.n
    np.testing.assert_allclose(m.sum, joint.sum, atol=1e-9)
    np.testing.assert_allclose(m.scatter, joint.scatter, atol=1e-8)
    np.testing.assert_allclose(m.covariance(), joint.covariance(), atol=1e-10)


def test_glr_properties():
    rng = np.random.RandomState(1)
    same = [GaussianStats.from_features(rng.randn(200, 3)) for _ in range(2)]
    far = GaussianStats.from_features(rng.randn(200, 3) + 8.0)
    glr = _pairwise_glr(same + [far])
    # same-distribution pair scores far lower than cross pairs
    assert glr[0, 1] < glr[0, 2] and glr[0, 1] < glr[1, 2]
    # GLR of near-identical distributions is small and ≥ ~0
    assert glr[0, 1] < 50.0


def test_two_speaker_clustering():
    rng = np.random.RandomState(2)
    segs_a = _segments(rng, 0.0, 4)
    segs_b = _segments(rng, 6.0, 4)
    res = cluster_segments(segs_a + segs_b, lambda_=1.0)
    assert isinstance(res, ClusterResult)
    assert res.num_clusters == 2
    first = set(res.assignment[:4].tolist())
    second = set(res.assignment[4:].tolist())
    assert len(first) == 1 and len(second) == 1 and first != second


def test_min_max_cluster_bounds():
    rng = np.random.RandomState(3)
    segs = _segments(rng, 0.0, 3) + _segments(rng, 5.0, 3) \
        + _segments(rng, -5.0, 3)
    forced_one = cluster_segments(segs, lambda_=1.0, min_clusters=1,
                                  max_clusters=1)
    assert forced_one.num_clusters == 1
    # a huge threshold keeps merging legal all the way to min_clusters
    bounded = cluster_segments(segs, lambda_=1.0, threshold=1e12,
                               min_clusters=4)
    assert bounded.num_clusters == 4


def test_bic_penalty_formula():
    d, n = 5, 1000.0
    p = 0.5 * (d + 0.5 * d * (d + 1))
    assert bic_penalty(d, n, 2.0) == 2.0 * p * np.log(n)
