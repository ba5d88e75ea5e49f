"""Pallas Mahalanobis kernel: accuracy vs float64 reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models.gmm import (MixtureModel, VarianceModel,
                                              am_scores, density_scores)


@pytest.fixture(scope="module")
def model(fixtures_dir):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    return MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING, max_approx=True)


def test_pallas_matches_f64(model, demo_corpus):
    feats = jnp.asarray(demo_corpus.features[:512])
    exact = np.asarray(density_scores(model.pack(dtype=jnp.float64), feats))
    pal = np.asarray(density_scores(model.pack(method="pallas"), feats))
    act = np.asarray(model.pack().active)
    mask = np.broadcast_to(act[None], exact.shape)
    rel = (np.abs(pal - exact) / (1.0 + np.abs(exact)))[mask]
    assert rel.max() < 3e-6, rel.max()
    # decision-relevant scores (near the per-frame winner) must be tiny in
    # absolute terms as well
    near = mask & (exact < exact.min(axis=(1, 2), keepdims=True) + 50.0)
    assert np.abs(pal - exact)[near].max() < 5e-5


def test_pallas_not_worse_than_mxu_f32(demo_corpus):
    """On decision-relevant scores (near the per-frame winner) the centered
    kernel must be at least as accurate as the f32 quadratic expansion —
    measured on the production no-pooling model whose tight per-density
    variances make the expansion's cancellation worst."""
    raw = read_mixture_set("/root/repo/bench/model.mix", 25)
    model = MixtureModel.from_raw(raw, VarianceModel.NO_POOLING, max_approx=True)
    feats = jnp.asarray(demo_corpus.features[:512])
    exact = np.asarray(density_scores(model.pack(dtype=jnp.float64), feats))
    mxu32 = np.asarray(density_scores(model.pack(dtype=jnp.float32), feats))
    pal = np.asarray(density_scores(model.pack(method="pallas"), feats))
    act = np.asarray(model.pack().active)
    mask = np.broadcast_to(act[None], exact.shape)
    near = mask & (exact < exact.min(axis=(1, 2), keepdims=True) + 50.0)
    assert (np.abs(pal - exact)[near].max()
            <= np.abs(mxu32 - exact)[near].max())


def test_pallas_am_scores_pipeline(model, demo_corpus):
    feats = jnp.asarray(demo_corpus.features[:256])
    exact = np.asarray(am_scores(model.pack(dtype=jnp.float64), feats))
    pal = np.asarray(am_scores(model.pack(method="pallas"), feats))
    rel = np.abs(pal - exact) / (1.0 + np.abs(exact))
    assert rel.max() < 3e-6
