"""Hybrid MLP stack: gradient check, training progress, serialization."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.models.nn import (
    MLP, AdaDeltaUpdater, NNScorer, SGDUpdater, build_context_windows,
    layer_specs_from_config)

LAYERS_CFG = Configuration({
    "layers": [
        {"layer-name": "hidden-layer1", "num-outputs": 20, "type": "feed-forward",
         "nonlinearity": "sigmoid", "input": ["data"]},
        {"layer-name": "hidden-layer2", "num-outputs": 20, "type": "feed-forward",
         "nonlinearity": "sigmoid", "input": ["hidden-layer1"]},
        {"layer-name": "output-layer", "num-outputs": 10, "type": "output",
         "input": ["hidden-layer2"]},
    ]
})


@pytest.fixture(scope="module")
def mlp():
    return MLP(layer_specs_from_config(LAYERS_CFG), input_dim=15)


def _toy_batch(rng, T=12, B=4, D=15, C=10):
    x = jnp.asarray(rng.normal(0, 1, (T, B, D)), jnp.float32)
    y = np.zeros((T, B, C), np.float32)
    y[np.arange(T)[:, None], np.arange(B)[None, :],
      rng.integers(0, C, (T, B))] = 1.0
    mask = np.ones((T, B), np.float32)
    mask[-3:, 0] = 0.0
    return x, jnp.asarray(y), jnp.asarray(mask)


def test_gradient_check(mlp):
    """Finite differences vs jax.grad (the reference ships the same check,
    NetworkLayer.cpp:36-112, tolerance 1e-2 at float32)."""
    rng = np.random.default_rng(0)
    params = mlp.init_params(rng)
    x, y, m = _toy_batch(rng)
    worst = mlp.gradient_check(params, x, y, m, tolerance=1e-2, samples=40)
    assert worst < 1e-2


@pytest.mark.parametrize("updater_cls", [SGDUpdater, AdaDeltaUpdater])
def test_loss_decreases(mlp, updater_cls):
    import jax
    rng = np.random.default_rng(1)
    params = mlp.init_params(rng)
    x, y, m = _toy_batch(rng)
    upd = updater_cls()
    if isinstance(upd, SGDUpdater):
        upd.learning_rate = 0.5
    state = upd.init_state(params)
    loss_fn = jax.jit(lambda p: mlp.loss(p, x, y, m))
    grad_fn = jax.jit(jax.grad(lambda p: mlp.loss(p, x, y, m)))
    start = float(loss_fn(params))
    for _ in range(60):
        params, state = upd.update(params, grad_fn(params), state)
    end = float(loss_fn(params))
    assert end < start, (start, end)


def test_softmax_output_normalized(mlp):
    rng = np.random.default_rng(2)
    params = mlp.init_params(rng)
    x = jnp.asarray(rng.normal(0, 1, (5, 15)), jnp.float32)
    lp = mlp.log_probs(params, x)
    sums = np.exp(np.asarray(lp)).sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_save_load_roundtrip(mlp, tmp_path):
    rng = np.random.default_rng(3)
    params = mlp.init_params(rng)
    mlp.save(params, str(tmp_path) + "/")
    loaded = mlp.load(str(tmp_path) + "/")
    for name in params:
        np.testing.assert_array_equal(np.asarray(params[name]["W"]),
                                      np.asarray(loaded[name]["W"]))
        np.testing.assert_array_equal(np.asarray(params[name]["b"]),
                                      np.asarray(loaded[name]["b"]))


def test_context_windows():
    x = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3))
    w = np.asarray(build_context_windows(x, 1))
    assert w.shape == (2, 4, 9)
    # frame 0: left context zero-padded, center == x[:,0], right == x[:,1]
    np.testing.assert_array_equal(w[0, 0, :3], 0.0)
    np.testing.assert_array_equal(w[0, 0, 3:6], np.asarray(x)[0, 0])
    np.testing.assert_array_equal(w[0, 0, 6:9], np.asarray(x)[0, 1])
    # last frame: right context zero-padded
    np.testing.assert_array_equal(w[0, 3, 6:9], 0.0)


def test_nn_scorer_shapes(mlp):
    rng = np.random.default_rng(4)
    specs = layer_specs_from_config(LAYERS_CFG)
    mlp3 = MLP(specs, input_dim=15 * 3)
    params = mlp3.init_params(rng)
    scorer = NNScorer(mlp3, params,
                      log_prior=jnp.zeros(10, jnp.float32), context_frames=1)
    feats = rng.normal(0, 1, (2, 8, 15)).astype(np.float32)
    am = np.asarray(scorer.am_batch(feats, 15))
    assert am.shape == (2, 8, 10)
    assert np.isfinite(am).all() and (am >= 0).all()
