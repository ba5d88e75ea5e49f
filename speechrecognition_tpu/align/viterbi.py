"""Batched Viterbi forced alignment as a masked max-plus `lax.scan`.

The reference aligns one utterance at a time with per-frame beam maps
(src/sietill/Alignment.cpp:149-288). Here the whole batch advances one
frame per scan step over a dense [B, A] position lattice; beam pruning is a
per-row threshold mask, so the result is *exactly* the reference's pruned
semantics (threshold-only pruning keeps a dense lattice exact).

Tie-breaking: the reference's pruned aligner inserts hypotheses in
ascending predecessor order with strict-< updates, so on equal scores the
*smallest predecessor* (largest jump) wins (Alignment.cpp:173-207); the
full DP prefers the loop (Alignment.cpp:96-113). Both orders are provided.

Final state: the pruned aligner backtracks from the *highest reached*
position in the last frame (Alignment.cpp:248-256); the full DP forces the
last position.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..lexicon import MarkovAutomaton
from ..tdp import TdpModel

BIG = np.float64(1e30)  # pseudo-infinity that stays NaN-free under adds


@dataclass
class AlignerTables:
    """Static per-batch tables for a set of segment automata."""

    states: np.ndarray   # int32 [B, A_max] global state per position (padded w/ last)
    lengths: np.ndarray  # int32 [B] automaton positions
    tdp: np.ndarray      # f64 [B, A_max, 3] penalty into position a with jump j

    @staticmethod
    def build(automata: List[MarkovAutomaton], tdp_model: TdpModel,
              pad_to: Optional[int] = None) -> "AlignerTables":
        B = len(automata)
        A = pad_to or max(a.num_states for a in automata)
        states = np.zeros((B, A), dtype=np.int32)
        lengths = np.zeros(B, dtype=np.int32)
        for i, a in enumerate(automata):
            states[i, : a.num_states] = a.states
            states[i, a.num_states:] = a.last_state
            lengths[i] = a.num_states
        tdp = tdp_model.table_for_states(states)
        return AlignerTables(states=states, lengths=lengths, tdp=tdp)


@partial(jax.jit, static_argnames=("tie_pruned", "use_pruning"))
def _align_scan(ams: jnp.ndarray, tdp: jnp.ndarray, pos_valid: jnp.ndarray,
                feat_len: jnp.ndarray, aut_len: jnp.ndarray,
                pruning_threshold: jnp.ndarray,
                tie_pruned: bool = True, use_pruning: bool = True,
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Core DP. ams f [B, T, A] emission scores per position; returns
    (positions int32 [B, T], best_costs [B], final_pos [B])."""
    B, T, A = ams.shape
    dtype = ams.dtype
    big = jnp.asarray(BIG, dtype)
    inf_row = jnp.full((B, 1), big, dtype)

    invalid = ~pos_valid  # [B, A]
    init = jnp.where(
        jnp.arange(A)[None, :] == 0, ams[:, 0, :], big)  # only position 0 live

    def step(prev, inputs):
        am_t, t = inputs
        c0 = prev + tdp[:, :, 0]
        c1 = jnp.concatenate([inf_row, prev[:, :-1] + tdp[:, 1:, 1]], axis=1)
        c2 = jnp.concatenate([inf_row.repeat(2, 1), prev[:, :-2] + tdp[:, 2:, 2]], axis=1)
        if tie_pruned:  # largest jump wins ties (first writer)
            best, jump = c2, jnp.full((B, A), 2, jnp.int8)
            for c, j in ((c1, 1), (c0, 0)):
                take = c < best
                best = jnp.where(take, c, best)
                jump = jnp.where(take, jnp.int8(j), jump)
        else:           # loop preferred (full DP, Alignment.cpp:96-113)
            best, jump = c0, jnp.zeros((B, A), jnp.int8)
            for c, j in ((c1, 1), (c2, 2)):
                take = c < best
                best = jnp.where(take, c, best)
                jump = jnp.where(take, jnp.int8(j), jump)
        cost = jnp.where(invalid, big, best + am_t)
        cost = jnp.minimum(cost, big)
        # renormalize per frame: decisions are invariant under a shared
        # offset, and the float32 carry stays O(threshold) instead of
        # drifting over hundreds of frames (see decoder.py)
        row_best = cost.min(axis=1, keepdims=True)
        row_best = jnp.where(row_best >= big * 0.5, 0.0, row_best)
        cost = jnp.where(cost >= big * 0.5, big, cost - row_best)
        if use_pruning:
            cost = jnp.where(cost > pruning_threshold, big, cost)
        # freeze rows whose utterance already ended
        alive = (t < feat_len)[:, None]
        cost = jnp.where(alive, cost, prev)
        return cost, jump

    final_cost, jumps = jax.lax.scan(
        step, init, (jnp.moveaxis(ams[:, 1:, :], 1, 0), jnp.arange(1, T)))
    # jumps: [T-1, B, A] for frames 1..T-1

    pos_ids = jnp.arange(A)[None, :]
    finite = final_cost < big * 0.5
    if tie_pruned:
        # highest reached finite position (Alignment.cpp:248-253)
        final_pos = jnp.max(jnp.where(finite, pos_ids, -1), axis=1)
        final_pos = jnp.maximum(final_pos, 0).astype(jnp.int32)
    else:
        final_pos = (aut_len - 1).astype(jnp.int32)
    best_costs = jnp.take_along_axis(final_cost, final_pos[:, None], axis=1)[:, 0]

    def back_step(cur, inputs):
        jump_t, t = inputs  # jump_t: [B, A] jumps taken INTO frame t
        active = t <= feat_len - 1  # does frame t exist for this utterance?
        emit = cur                   # position at frame t (valid when active)
        prev_pos = cur - jnp.take_along_axis(
            jump_t.astype(jnp.int32), cur[:, None], axis=1)[:, 0]
        new_cur = jnp.where(active, prev_pos, final_pos)
        return new_cur, emit

    # walk t = T-1 .. 1, emitting the position at frame t
    ts = jnp.arange(T - 1, 0, -1)
    pos0, rev_positions = jax.lax.scan(
        back_step, final_pos, (jumps[::-1], ts))
    positions = jnp.concatenate(
        [pos0[:, None], rev_positions.T[:, ::-1]], axis=1)  # [B, T]
    return positions.astype(jnp.int32), best_costs, final_pos


def align_batch(pack, feats: np.ndarray, feat_len: np.ndarray,
                tables: AlignerTables, pruning_threshold: Optional[float] = 50.0,
                tie_pruned: bool = True, dtype=jnp.float32,
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Align a padded batch. Returns (states int32 [B, T], costs f [B]).

    pack: gmm.ScorePack. feats f32 [B, T, dim] zero-padded, feat_len [B].
    pruning_threshold None → full DP (no pruning, forced final position).
    """
    from ..models import gmm as gmm_mod

    B, T, dim = feats.shape
    flat = jnp.asarray(feats.reshape(B * T, dim))
    am = gmm_mod.am_scores(pack, flat).reshape(B, T, pack.num_mixtures)
    am = am.astype(dtype)
    states_tbl = jnp.asarray(tables.states)
    ams = jnp.take_along_axis(am, states_tbl[:, None, :].astype(jnp.int32), axis=2)
    A = tables.states.shape[1]
    pos_valid = jnp.arange(A)[None, :] < jnp.asarray(tables.lengths)[:, None]
    use_pruning = pruning_threshold is not None
    thr = jnp.asarray(pruning_threshold if use_pruning else 0.0, dtype)
    positions, costs, _ = _align_scan(
        ams, jnp.asarray(tables.tdp, dtype), pos_valid,
        jnp.asarray(feat_len, jnp.int32), jnp.asarray(tables.lengths, jnp.int32),
        thr, tie_pruned=tie_pruned, use_pruning=use_pruning)
    states = jnp.take_along_axis(states_tbl, positions, axis=1)
    return np.asarray(states), np.asarray(costs)
