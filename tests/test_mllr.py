"""MLLR adaptation tests (Mm/MllrAdaptation.cc semantics).

Invariants:
  * full MLLR recovers a planted affine mean transform (W = [b A]);
  * shift MLLR recovers a planted constant bias;
  * sharded accumulate + merge == single pass;
  * regression-tree backoff: starved leaves climb to the deepest
    sufficient ancestor, a starved root yields identity;
  * end-to-end adapt_model lowers the AM score on adaptation data.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.models.gmm import (MixtureModel, VarianceModel,
                                              accumulate_chunk, am_scores)
from speechrecognition_tpu.train.mllr import (FullMllrEstimator,
                                              RegressionTree,
                                              ShiftMllrEstimator, adapt_model,
                                              viterbi_density_means)


def _make_model(rng, S=6, dim=4):
    """Small GMM trained one EM pass on synthetic per-state clusters."""
    model = MixtureModel(dim, S, VarianceModel.NO_POOLING, max_approx=True)
    centers = rng.normal(0, 4, (S, dim))
    feats = np.concatenate(
        [centers[s] + rng.normal(0, 0.5, (400, dim)) for s in range(S)])
    states = np.repeat(np.arange(S), 400).astype(np.int32)
    pack = model.pack(dtype=jnp.float64)
    w, xs, x2s = accumulate_chunk(pack, jnp.asarray(feats),
                                  jnp.asarray(states),
                                  jnp.ones(len(feats)), True)
    model.apply_statistics(np.asarray(w), np.asarray(xs), np.asarray(x2s))
    model.finalize()
    return model, centers, feats, states


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    return rng, *_make_model(rng)


def test_full_mllr_recovers_affine_transform(setup):
    rng, model, centers, _f, _s = setup
    pack = model.pack(dtype=jnp.float64)
    A = np.eye(4) * 0.8
    A[0, 1] = 0.3
    b = np.array([0.5, -1.0, 0.25, 2.0])
    # adaptation data drawn around the transformed state means
    S, dim = centers.shape
    feats = np.concatenate(
        [model.means[model.mixtures[s][0][0]] @ A.T + b
         + rng.normal(0, 0.05, (300, dim)) for s in range(S)])
    states = np.repeat(np.arange(S), 300).astype(np.int32)

    means, _vars = viterbi_density_means(model, pack, feats, states)
    tree = RegressionTree.single_class(S)
    est = FullMllrEstimator(tree, dim, min_observations=100)
    est.accumulate(feats, states, means)
    per_leaf, counts = est.estimate()
    W = per_leaf[0]
    np.testing.assert_allclose(W[:, 0], b, atol=0.05)
    np.testing.assert_allclose(W[:, 1:], A, atol=0.05)

    # merge equivalence: two half-accumulations combine to the same W
    e1 = FullMllrEstimator(tree, dim, min_observations=100)
    e2 = FullMllrEstimator(tree, dim, min_observations=100)
    n = len(feats) // 2
    e1.accumulate(feats[:n], states[:n], means[:n])
    e2.accumulate(feats[n:], states[n:], means[n:])
    e1.merge(e2)
    W2 = e1.estimate()[0][0]
    np.testing.assert_allclose(W2, W, rtol=1e-10, atol=1e-12)


def test_shift_mllr_recovers_bias(setup):
    rng, model, centers, _f, _s = setup
    pack = model.pack(dtype=jnp.float64)
    b = np.array([1.5, -0.5, 0.0, 0.75])
    S, dim = centers.shape
    feats = np.concatenate(
        [model.means[model.mixtures[s][0][0]] + b
         + rng.normal(0, 0.05, (200, dim)) for s in range(S)])
    states = np.repeat(np.arange(S), 200).astype(np.int32)
    means, variances = viterbi_density_means(model, pack, feats, states)
    est = ShiftMllrEstimator(RegressionTree.single_class(S), dim,
                             min_observations=100)
    est.accumulate(feats, states, means, variances)
    shift = est.estimate()[0][0]
    np.testing.assert_allclose(shift, b, atol=0.05)


def test_tree_backoff_and_identity_fallback(setup):
    rng, model, centers, _f, _s = setup
    S, dim = centers.shape
    # 2 regression classes: states 0-2 → leaf 0, 3-5 → leaf 1
    leaf_map = np.array([0, 0, 0, 1, 1, 1])
    tree = RegressionTree.balanced(2, leaf_map)
    assert tree.num_nodes == 3 and tree.num_leaves == 2

    pack = model.pack(dtype=jnp.float64)
    b = np.full(dim, 2.0)
    # plenty of data for leaf 0, too little for leaf 1
    f0 = np.concatenate(
        [model.means[model.mixtures[s][0][0]] + b
         + rng.normal(0, 0.05, (300, dim)) for s in range(3)])
    s0 = np.repeat(np.arange(3), 300).astype(np.int32)
    f1 = model.means[model.mixtures[3][0][0]] + b + rng.normal(0, 0.05, (5, dim))
    s1 = np.full(5, 3, np.int32)
    feats = np.concatenate([f0, f1])
    states = np.concatenate([s0, s1])
    means, variances = viterbi_density_means(model, pack, feats, states)

    est = ShiftMllrEstimator(tree, dim, min_observations=100)
    est.accumulate(feats, states, means, variances)
    per_leaf, node_counts = est.estimate()
    # leaf 1 is starved → climbs to the root, which has enough data
    np.testing.assert_allclose(per_leaf[1], per_leaf[0], atol=0.2)
    assert node_counts[0] == len(feats)

    # starved everywhere → identity (full) / zero shift
    est2 = FullMllrEstimator(tree, dim, min_observations=1e9)
    est2.accumulate(feats, states, means)
    pl2, _ = est2.estimate()
    unit = np.concatenate([np.zeros((dim, 1)), np.eye(dim)], axis=1)
    np.testing.assert_array_equal(pl2[0], unit)
    np.testing.assert_array_equal(pl2[1], unit)


def test_adapt_model_improves_am_score(setup):
    rng, model, centers, _f, _s = setup
    S, dim = centers.shape
    pack = model.pack(dtype=jnp.float64)
    b = np.array([1.0, 1.0, -1.0, 0.5])
    feats = np.concatenate(
        [model.means[model.mixtures[s][0][0]] + b
         + rng.normal(0, 0.1, (200, dim)) for s in range(S)])
    states = np.repeat(np.arange(S), 200).astype(np.int32)

    def score(m):
        p = m.pack(dtype=jnp.float64)
        am = np.asarray(am_scores(p, jnp.asarray(feats)))
        return float(am[np.arange(len(states)), states].mean())

    before = score(model)
    for mode in ("full", "shift"):
        adapted = adapt_model(model, pack, feats, states, mode=mode,
                              min_observations=100)
        assert score(adapted) < before - 1.0, mode
        # original untouched
        assert score(model) == before
