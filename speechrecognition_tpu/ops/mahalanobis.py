"""Pallas TPU kernel: batched diagonal-Mahalanobis GMM density scoring.

score[n, j] = Σᵢ (x[n,i] − μ[j,i])² · a[j,i] + c[j]

with a = 1/(2σ²) and c = norm − log w, i.e. the reference's density score
(Mixtures.cpp:590-628). The MXU formulation (quadratic expansion as one
matmul, models/gmm.py) loses ~1e-4 of the score to cancellation in
float32; this kernel computes the *centered* form directly on the VPU so
accumulation happens at the result's own magnitude (~1e-6 error).

Layout: all three operands are transposed so the feature dimension lies
on SUBLANES (padded to a multiple of 8; padded rows carry a = 0):

    x_t  [DIM_PAD, TILE_N]   one tile of frames
    mu_t [DIM_PAD, TILE_J]   one tile of densities
    a_t  [DIM_PAD, TILE_J]
    out  [TILE_N, TILE_J]

and the kernel runs a ``fori_loop`` over the feature dim with dynamic
sublane indexing, each step one [TILE_N, TILE_J] broadcast
subtract/square/scale accumulate. The loop (vs. a 25-step unroll)
is what keeps the Mosaic schedule small — the unrolled variant took
~19 minutes to compile. All tile shapes respect the (8, 128) f32 tiling
constraint — a block whose last dimension is the raw feature size (25)
hangs Mosaic.
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
LANES = 128


def _kernel(x_t_ref, mu_t_ref, a_t_ref, out_ref, *, dim: int):
    # x_t_ref  [DIM_PAD, TILE_N]  transposed frames (features on sublanes)
    # mu_t_ref [DIM_PAD, TILE_J]  transposed codebook (densities on lanes)
    # a_t_ref  [DIM_PAD, TILE_J]
    #
    # fori_loop over the feature dim with *dynamic sublane* indexing —
    # one compiled body instead of a 25-step unrolled broadcast chain,
    # which took Mosaic ~19 minutes to schedule (ROADMAP round-1 item 3).
    def body(i, acc):
        d = x_t_ref[i, :][:, None] - mu_t_ref[i, :][None, :]
        return acc + d * d * a_t_ref[i, :][None, :]

    out_ref[:, :] = jax.lax.fori_loop(
        0, dim, body, jnp.zeros((TILE_N, TILE_J), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def mahalanobis_scores(x: jnp.ndarray, mu: jnp.ndarray, a: jnp.ndarray,
                       c: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x [N, dim] f32, mu/a [J, dim] f32, c [J] f32 → scores [N, J] f32.

    N, J are padded to tile multiples and dim to 128 lanes internally.
    """
    N, dim = x.shape
    J = mu.shape[0]
    Np = -(-N // TILE_N) * TILE_N
    Jp = -(-J // TILE_J) * TILE_J
    if dim > LANES:
        raise ValueError(f"feature dim {dim} exceeds {LANES} lanes")

    DIM_PAD = -(-dim // 8) * 8  # sublane multiple
    x_t = jnp.zeros((DIM_PAD, Np), jnp.float32).at[:dim, :N].set(
        x.astype(jnp.float32).T)
    mu_t = jnp.zeros((DIM_PAD, Jp), jnp.float32).at[:dim, :J].set(
        mu.astype(jnp.float32).T)
    a_t = jnp.zeros((DIM_PAD, Jp), jnp.float32).at[:dim, :J].set(
        a.astype(jnp.float32).T)

    # The package enables x64 globally for host-side parity math; Mosaic
    # requires 32-bit index literals, so trace the kernel without x64.
    with jax.enable_x64(False):
        out = _call_kernel(x_t, mu_t, a_t, Np, Jp, DIM_PAD, dim, interpret)
    return out[:N, :J] + c.astype(jnp.float32)[None, :]


def _call_kernel(x_t, mu_t, a_t, Np, Jp, DIM_PAD, dim, interpret):
    return pl.pallas_call(
        functools.partial(_kernel, dim=dim),
        grid=(Np // TILE_N, Jp // TILE_J),
        in_specs=[
            pl.BlockSpec((DIM_PAD, TILE_N), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM_PAD, TILE_J), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DIM_PAD, TILE_J), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_J), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Jp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * Np * Jp * dim,
            bytes_accessed=4 * (DIM_PAD * Np + 2 * DIM_PAD * Jp + Np * Jp),
            transcendentals=0),
        interpret=interpret,
    )(x_t, mu_t, a_t)


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
