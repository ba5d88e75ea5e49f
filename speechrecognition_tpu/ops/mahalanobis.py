"""Pallas TPU kernel: batched diagonal-Mahalanobis GMM density scoring.

score[n, j] = Σᵢ (x[n,i] − μ[j,i])² · a[j,i] + c[j]

with a = 1/(2σ²) and c = norm − log w, i.e. the reference's density score
(Mixtures.cpp:590-628). The obvious MXU formulation (quadratic expansion
as one matmul, models/gmm.py) loses ~1e-3 of the score to catastrophic
cancellation in float32 — the expansion terms are O(10²-10³) while the
result is O(10). This kernel computes the *centered* form directly on the
VPU, so the accumulation happens at the result's own magnitude and f32
keeps ~1e-6 absolute accuracy — enough to reproduce the C++ double
decoder's decisions.

Tiling: grid over (N/128, J/128); each step broadcasts one feature column
against one codebook column and accumulates a [128, 128] tile, unrolled
over the (padded) feature dimension.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_J = 128


def _kernel(x_ref, mu_ref, a_ref, c_ref, out_ref, *, dim: int):
    acc = jnp.zeros((TILE_N, TILE_J), jnp.float32)
    for i in range(dim):
        d = x_ref[:, i][:, None] - mu_ref[:, i][None, :]
        acc = acc + d * d * a_ref[:, i][None, :]
    out_ref[:, :] = acc + c_ref[0, :][None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mahalanobis_scores(x: jnp.ndarray, mu: jnp.ndarray, a: jnp.ndarray,
                       c: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x [N, dim] f32, mu/a [J, dim] f32, c [J] f32 → scores [N, J] f32.

    N and J are padded to multiples of 128 internally; callers slice.
    """
    N, dim = x.shape
    J = mu.shape[0]
    Np = -(-N // TILE_N) * TILE_N
    Jp = -(-J // TILE_J) * TILE_J

    xp = jnp.pad(x.astype(jnp.float32), ((0, Np - N), (0, 0)))
    mup = jnp.pad(mu.astype(jnp.float32), ((0, Jp - J), (0, 0)))
    ap = jnp.pad(a.astype(jnp.float32), ((0, Jp - J), (0, 0)))
    cp = jnp.pad(c.astype(jnp.float32), (0, Jp - J))[None, :]

    # The package enables x64 globally for host-side parity math; Mosaic
    # requires 32-bit index literals, so trace the kernel without x64.
    with jax.enable_x64(False):
        out = _call_kernel(xp, mup, ap, cp, Np, Jp, dim, interpret)
    return out[:N, :J]


def _call_kernel(xp, mup, ap, cp, Np, Jp, dim, interpret):
    out = pl.pallas_call(
        functools.partial(_kernel, dim=dim),
        grid=(Np // TILE_N, Jp // TILE_J),
        in_specs=[
            pl.BlockSpec((TILE_N, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_J, dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_J, dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_J), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_J), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Jp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * Np * Jp * dim, bytes_accessed=4 * (Np * dim + 2 * Jp * dim + Np * Jp),
            transcendentals=0),
        interpret=interpret,
    )(xp, mup, ap, cp)
    return out


def pack_to_mahalanobis(model) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a host MixtureModel into (mu, a, c, active) arrays keyed by
    flat slot j = s·D + d, padded like ScorePack (inactive → c huge)."""
    from ..models.gmm import INACTIVE_SCORE

    S = model.num_mixtures
    D = model.max_densities_per_mixture
    dim = model.dim
    mu = np.zeros((S * D, dim), np.float32)
    a = np.zeros((S * D, dim), np.float32)
    c = np.full(S * D, np.float32(INACTIVE_SCORE), np.float32)
    active = np.zeros((S, D), bool)
    for s in range(S):
        for d, (mean_idx, var_idx) in enumerate(model.mixtures[s]):
            m_vec = model.means[mean_idx]
            iv = model.vars_inv[var_idx]
            cc = model.norm[var_idx] - model.mean_weights_log[mean_idx]
            if not (np.isfinite(m_vec).all() and np.isfinite(iv).all()
                    and np.isfinite(cc)):
                continue
            j = s * D + d
            mu[j] = m_vec
            a[j] = 0.5 * iv
            c[j] = cc
            active[s, d] = True
    return mu, a, c, active
