"""Char-RNN LM: jax.grad of the scanned forward must equal the reference's
hand-written backprop (min-char-rnn.py:30-61, ported to numpy here), and
short training must reduce the loss on a repetitive corpus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechrecognition_tpu.lm.char_rnn import (CharRnnLm, init_params,
                                               loss_fn, train_step)


def numpy_loss_and_grads(params, inputs, targets, hprev):
    """Direct port of min-char-rnn.py lossFun (forward + manual backprop)."""
    Wxh, Whh, Why = (np.asarray(params[k], np.float64)
                     for k in ("Wxh", "Whh", "Why"))
    bh = np.asarray(params["bh"], np.float64)[:, None]
    by = np.asarray(params["by"], np.float64)[:, None]
    V = Wxh.shape[1]
    xs, hs, ps = {}, {}, {}
    hs[-1] = hprev.copy()
    loss = 0.0
    for t in range(len(inputs)):
        xs[t] = np.zeros((V, 1))
        xs[t][inputs[t]] = 1
        hs[t] = np.tanh(Wxh @ xs[t] + Whh @ hs[t - 1] + bh)
        ys = Why @ hs[t] + by
        e = np.exp(ys - ys.max())
        ps[t] = e / e.sum()
        loss += -np.log(ps[t][targets[t], 0])
    dWxh, dWhh, dWhy = np.zeros_like(Wxh), np.zeros_like(Whh), np.zeros_like(Why)
    dbh, dby = np.zeros_like(bh), np.zeros_like(by)
    dhnext = np.zeros_like(hs[0])
    for t in reversed(range(len(inputs))):
        dy = ps[t].copy()
        dy[targets[t]] -= 1
        dWhy += dy @ hs[t].T
        dby += dy
        dh = Why.T @ dy + dhnext
        dhraw = (1 - hs[t] * hs[t]) * dh
        dbh += dhraw
        dWxh += dhraw @ xs[t].T
        dWhh += dhraw @ hs[t - 1].T
        dhnext = Whh.T @ dhraw
    return loss, dict(Wxh=dWxh, Whh=dWhh, Why=dWhy,
                      bh=dbh[:, 0], by=dby[:, 0])


def test_grad_matches_reference_backprop():
    V, H, T = 7, 11, 13
    params = init_params(V, H, seed=3, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    inputs = rng.randint(0, V, size=T)
    targets = rng.randint(0, V, size=T)
    h0 = rng.randn(H) * 0.1

    loss_np, grads_np = numpy_loss_and_grads(
        params, inputs, targets, h0[:, None])
    (loss_jx, _), grads_jx = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jnp.asarray(inputs), jnp.asarray(targets), jnp.asarray(h0))

    assert float(loss_jx) == pytest.approx(loss_np, rel=1e-10)
    for k in grads_np:
        np.testing.assert_allclose(np.asarray(grads_jx[k]).reshape(
            grads_np[k].shape), grads_np[k], atol=1e-10, err_msg=k)


def test_training_reduces_loss_and_samples():
    text = "hello world. " * 80
    lm = CharRnnLm(text, hidden_size=32, seq_length=25, seed=1)
    losses = lm.train(300)
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20])
    out = lm.sample_text(50, seed_char="h", rng_seed=4)
    assert len(out) == 50 and set(out) <= set(lm.vocab)


def test_adagrad_state_updates():
    V, H, T = 5, 8, 6
    params = init_params(V, H, seed=0, dtype=jnp.float64)
    mem = jax.tree_util.tree_map(jnp.zeros_like, params)
    rng = np.random.RandomState(2)
    inputs = jnp.asarray(rng.randint(0, V, size=T))
    targets = jnp.asarray(rng.randint(0, V, size=T))
    h0 = jnp.zeros(H, jnp.float64)
    p2, m2, loss, h = train_step(params, mem, inputs, targets, h0)
    # mem accumulates squared grads (positive somewhere), params move
    assert float(sum(jnp.abs(m).sum() for m in jax.tree_util.tree_leaves(m2))) > 0
    assert float(loss) > 0
    moved = any(bool(jnp.any(p2[k] != params[k])) for k in params)
    assert moved
