"""Baum-Welch (forward-backward) soft alignment as batched logsumexp scans.

The Sprint aligner supports two modes (rwth-asr-0.5/src/Search/Aligner.hh:41-43):
``modeViterbi`` (the max-plus path in align/viterbi.py) and ``modeBaumWelch``,
whose result is an alignment graph whose arc weights are negative-log
*posterior* probabilities (Search/Aligner.hh:150-153).  Here the same
posteriors come out of a dense forward-backward over the banded [B, A]
position lattice — two `lax.scan`s with a 3-way logsumexp over the 0-1-2
jumps instead of the Viterbi min, everything batched over utterances.

Posterior pruning mirrors Sprint's minimum-weight cut on the weighted
alignment (weights below the threshold are dropped and the per-frame
distribution renormalized), so downstream EM accumulation sees exactly the
reference's "weighted AlignmentItem" semantics (sietill carries the same
per-item weight field, src/sietill/Types.hpp:36-43, and accumulates with it,
src/sietill/Mixtures.cpp:278-372).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .viterbi import BIG, AlignerTables

NEG_BIG = -np.float64(1e30)


def _lse3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Elementwise logsumexp of three log-domain terms, NaN-free at -BIG."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    safe_m = jnp.maximum(m, NEG_BIG * 0.5)  # all-dead rows stay at -BIG
    out = safe_m + jnp.log(
        jnp.exp(a - safe_m) + jnp.exp(b - safe_m) + jnp.exp(c - safe_m))
    return jnp.where(m <= NEG_BIG * 0.5, NEG_BIG, out)


@partial(jax.jit, static_argnames=())
def _forward_backward(lams: jnp.ndarray, ltdp: jnp.ndarray,
                      pos_valid: jnp.ndarray, feat_len: jnp.ndarray,
                      aut_len: jnp.ndarray,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior occupation over the banded lattice.

    lams  f [B, T, A]: log-domain emission (= −score) per position.
    ltdp  f [B, A, 3]: log-domain transition (= −penalty) into position a
                       with jump j.
    Returns (gamma [B, T, A] posteriors summing to 1 over valid positions
    of valid frames, log_z [B] total path log-probability).

    The automaton must start in position 0 and end in position len-1
    (the full-DP boundary conditions, src/sietill/Alignment.cpp:60-66,139).
    """
    B, T, A = lams.shape
    dtype = lams.dtype
    neg_big = jnp.asarray(NEG_BIG, dtype)
    ninf_row = jnp.full((B, 1), neg_big, dtype)
    invalid = ~pos_valid  # [B, A]

    def mask(x):
        return jnp.where(invalid, neg_big, x)

    # -- forward ------------------------------------------------------------
    alpha0 = mask(jnp.where(jnp.arange(A)[None, :] == 0, lams[:, 0, :], neg_big))

    def fwd_step(prev, inputs):
        lam_t, t = inputs
        c0 = prev + ltdp[:, :, 0]
        c1 = jnp.concatenate([ninf_row, prev[:, :-1] + ltdp[:, 1:, 1]], axis=1)
        c2 = jnp.concatenate([ninf_row.repeat(2, 1),
                              prev[:, :-2] + ltdp[:, 2:, 2]], axis=1)
        alpha = mask(_lse3(c0, c1, c2) + lam_t)
        # shift by the per-row max so the f32 carry never under/overflows
        row_max = alpha.max(axis=1, keepdims=True)
        shift = jnp.where(row_max <= neg_big * 0.5, 0.0, row_max)
        alpha = jnp.where(alpha <= neg_big * 0.5, neg_big, alpha - shift)
        alive = (t < feat_len)[:, None]
        alpha = jnp.where(alive, alpha, prev)
        shift = jnp.where(alive[:, 0], shift[:, 0], 0.0)
        return alpha, (alpha, shift)

    _, (alphas_rest, fwd_shifts) = jax.lax.scan(
        fwd_step, alpha0, (jnp.moveaxis(lams[:, 1:, :], 1, 0), jnp.arange(1, T)))
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T, B, A]

    # -- backward -----------------------------------------------------------
    # beta[t, a] = log P(frames t+1..T-1 | in position a at t); at the last
    # real frame only the final position len-1 is allowed.
    last_mask = jnp.arange(A)[None, :] == (aut_len - 1)[:, None]
    beta_T = jnp.where(last_mask, 0.0, neg_big)

    def bwd_step(nxt, inputs):
        lam_t1, t = inputs  # emission of frame t+1; computing beta at frame t
        term = nxt + lam_t1                       # [B, A] at position a' of t+1
        b0 = term + ltdp[:, :, 0]                 # stay: a' = a
        b1 = jnp.concatenate([term[:, 1:] + ltdp[:, 1:, 1], ninf_row], axis=1)
        b2 = jnp.concatenate([term[:, 2:] + ltdp[:, 2:, 2],
                              ninf_row.repeat(2, 1)], axis=1)
        beta = mask(_lse3(b0, b1, b2))
        row_max = beta.max(axis=1, keepdims=True)
        shift = jnp.where(row_max <= neg_big * 0.5, 0.0, row_max)
        beta = jnp.where(beta <= neg_big * 0.5, neg_big, beta - shift)
        # frames at/after the end of this utterance: beta is the last-frame
        # boundary condition (so frame feat_len-1 sees beta_T as its "next")
        is_tail = (t >= feat_len - 1)[:, None]
        beta = jnp.where(is_tail, beta_T, beta)
        return beta, beta

    ts = jnp.arange(T - 2, -1, -1)
    _, betas_rev = jax.lax.scan(
        bwd_step, beta_T, (jnp.moveaxis(lams[:, 1:, :], 1, 0)[::-1], ts))
    betas = jnp.concatenate([betas_rev[::-1], beta_T[None]], axis=0)  # [T, B, A]

    # -- posteriors ---------------------------------------------------------
    post = alphas + betas                                   # [T, B, A]
    row_max = post.max(axis=2, keepdims=True)
    safe = jnp.maximum(row_max, neg_big * 0.5)
    p = jnp.exp(post - safe)
    p = jnp.where(post <= neg_big * 0.5, 0.0, p)
    denom = p.sum(axis=2, keepdims=True)
    gamma = p / jnp.maximum(denom, 1e-30)
    frame_valid = (jnp.arange(T)[:, None] < feat_len[None, :])  # [T, B]
    gamma = jnp.where(frame_valid[:, :, None], gamma, 0.0)

    # total log-prob: alpha at the forced final position of the last frame,
    # plus the accumulated forward shifts (the per-frame renormalizers)
    tb = jnp.moveaxis(alphas, 0, 1)  # [B, T, A]
    last_t = (feat_len - 1).astype(jnp.int32)
    alpha_last = jnp.take_along_axis(tb, last_t[:, None, None], axis=1)[:, 0]
    log_z_tail = jnp.take_along_axis(
        alpha_last, (aut_len - 1)[:, None].astype(jnp.int32), axis=1)[:, 0]
    shift_mask = (jnp.arange(1, T)[:, None] < feat_len[None, :])
    log_z = log_z_tail + jnp.sum(jnp.where(shift_mask, fwd_shifts, 0.0), axis=0)
    return jnp.moveaxis(gamma, 0, 1), log_z  # [B, T, A], [B]


def baum_welch_posteriors(pack, feats: np.ndarray, feat_len: np.ndarray,
                          tables: AlignerTables,
                          weight_threshold: float = 0.0,
                          dtype=jnp.float32,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior position occupancies for a padded batch.

    pack: gmm.ScorePack; feats f32 [B, T, dim]; feat_len int [B].
    Returns (gamma [B, T, A], log_z [B]).  ``weight_threshold`` drops
    posteriors below the cut and renormalizes (Sprint's minimum-weight
    pruning on weighted alignments).
    """
    from ..models import gmm as gmm_mod

    B, T, dim = feats.shape
    flat = jnp.asarray(feats.reshape(B * T, dim))
    am = gmm_mod.am_scores(pack, flat).reshape(B, T, pack.num_mixtures)
    states_tbl = jnp.asarray(tables.states)
    ams = jnp.take_along_axis(
        am, states_tbl[:, None, :].astype(jnp.int32), axis=2).astype(dtype)
    A = tables.states.shape[1]
    pos_valid = jnp.arange(A)[None, :] < jnp.asarray(tables.lengths)[:, None]
    gamma, log_z = _forward_backward(
        -ams, -jnp.asarray(tables.tdp, dtype), pos_valid,
        jnp.asarray(feat_len, jnp.int32), jnp.asarray(tables.lengths, jnp.int32))
    if weight_threshold > 0.0:
        gamma = jnp.where(gamma < weight_threshold, 0.0, gamma)
        denom = gamma.sum(axis=2, keepdims=True)
        gamma = jnp.where(denom > 0, gamma / jnp.maximum(denom, 1e-30), 0.0)
    return gamma, log_z


def accumulate_baum_welch(pack, feats: jnp.ndarray, gamma: jnp.ndarray,
                          states_tbl: jnp.ndarray,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EM sufficient statistics from soft (posterior-weighted) alignments.

    feats f32 [B, T, dim]; gamma [B, T, A] position posteriors (0 on padding);
    states_tbl int32 [B, A] global state per position.  Returns
    (w [S,D], xs [S,D,dim], x2s [S,D,dim]) in float64 — the same accumulator
    layout as gmm.accumulate_chunk, with each (frame, position) pair counted
    at its posterior weight (the weighted form of the reference's
    accumulate, src/sietill/Mixtures.cpp:278-372).

    Density membership within a mixture follows the pack's max-approx /
    sum setting, evaluated on the frame's features exactly as the hard
    path does.
    """
    from ..models import gmm as gmm_mod

    B, T, A = gamma.shape
    dim = feats.shape[2]
    S, D = pack.num_mixtures, pack.density_cap

    flat_feats = feats.reshape(B * T, dim)
    sc = gmm_mod.density_scores(pack, flat_feats)          # [B·T, S, D]
    if pack.max_approx:
        best = jnp.argmin(sc, axis=-1)                     # [B·T, S]
        memb = jax.nn.one_hot(best, D, dtype=pack.dtype)   # [B·T, S, D]
    else:
        shifted = sc - sc.min(axis=-1, keepdims=True)
        p = jnp.exp(-shifted)
        memb = p / p.sum(axis=-1, keepdims=True)
        memb = jnp.where(memb < gmm_mod.MEMBERSHIP_EPS, 0.0, memb)

    # fold the [B, T, A] posterior onto states: occ[b·t, s] = Σ_a γ 1[state=s]
    states_rep = jnp.broadcast_to(
        states_tbl[:, None, :].astype(jnp.int32), (B, T, A)).reshape(B * T, A)
    occ = jax.vmap(
        lambda g, st: jax.ops.segment_sum(g, st, num_segments=S)
    )(gamma.reshape(B * T, A), states_rep)

    g64 = (occ[:, :, None] * memb).astype(jnp.float64)     # [B·T, S, D]
    f64 = flat_feats.astype(jnp.float64)
    w = g64.sum(axis=0)                                    # [S, D]
    xs = jnp.einsum("nsd,ni->sdi", g64, f64)
    x2s = jnp.einsum("nsd,ni->sdi", g64, f64 * f64)
    return w, xs, x2s


def best_path_from_posteriors(gamma: np.ndarray, tables: AlignerTables,
                              ) -> np.ndarray:
    """Per-frame argmax state from the posterior lattice (the 1-best view
    of a Baum-Welch alignment).  Returns int32 [B, T] global states."""
    pos = np.asarray(gamma).argmax(axis=2)                 # [B, T]
    return np.take_along_axis(tables.states, pos, axis=1).astype(np.int32)
