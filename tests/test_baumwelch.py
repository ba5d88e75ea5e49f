"""Baum-Welch soft alignment: forward-backward posteriors over the banded
automaton lattice (Sprint modeBaumWelch, rwth-asr Search/Aligner.hh:41-43).

Verified three ways: against brute-force path enumeration on a tiny
lattice, against the Viterbi aligner in the sharp-score limit, and the
weighted EM accumulators against the hard path on one-hot posteriors.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.align.baumwelch import (accumulate_baum_welch,
                                                   baum_welch_posteriors,
                                                   best_path_from_posteriors)
from speechrecognition_tpu.align.viterbi import AlignerTables, align_batch
from speechrecognition_tpu.lexicon import MarkovAutomaton, build_sietill_lexicon
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.tdp import TdpModel


def _toy_model(dim=4, num_states=8, seed=0, max_approx=True):
    rng = np.random.default_rng(seed)
    model = MixtureModel(dim=dim, num_mixtures=num_states,
                         var_model=VarianceModel.NO_POOLING,
                         max_approx=max_approx)
    model.mean_weight_acc[:] = 50.0
    model.mean_acc[:] = rng.normal(0, 1, model.mean_acc.shape) * 50.0
    model.var_weight_acc[:] = 50.0
    model.var_acc[:] = 50.0 * (1.0 + 0.2 * rng.random(model.var_acc.shape)) \
        + (model.mean_acc ** 2) / 50.0
    model.finalize()
    return model


def _enumerate_paths(T, L):
    """All monotone 0-1-2 paths over positions 0..L-1 from 0 to L-1."""
    paths = []
    for jumps in itertools.product((0, 1, 2), repeat=T - 1):
        pos = [0]
        for j in jumps:
            pos.append(pos[-1] + j)
        if pos[-1] == L - 1 and max(pos) <= L - 1:
            paths.append(pos)
    return paths


def test_posteriors_match_brute_force():
    """Exact check: gamma and log Z vs full path enumeration."""
    dim, L, T = 4, 4, 6
    model = _toy_model(dim=dim, num_states=L, seed=3)
    pack = model.pack(dtype=jnp.float64)
    tdp = TdpModel(silence_state=L + 7, loop=1.5, forward=0.0, skip=4.0)
    aut = MarkovAutomaton(states=np.arange(L, dtype=np.int32))
    tables = AlignerTables.build([aut], tdp)

    rng = np.random.default_rng(11)
    feats = rng.normal(0, 1, (1, T, dim)).astype(np.float32)
    lens = np.array([T], np.int32)

    gamma, log_z = baum_welch_posteriors(pack, feats, lens, tables,
                                         dtype=jnp.float64)
    gamma = np.asarray(gamma)[0]
    log_z = float(np.asarray(log_z)[0])

    # brute force in -log space with the same emission scores
    from speechrecognition_tpu.models.gmm import am_scores
    am = np.asarray(am_scores(pack, jnp.asarray(feats[0])))  # [T, S]
    jump_pen = np.array([1.5, 0.0, 4.0])
    ref_gamma = np.zeros((T, L))
    probs = []
    paths = _enumerate_paths(T, L)
    assert paths
    for pos in paths:
        cost = am[0, pos[0]]
        for t in range(1, T):
            cost += jump_pen[pos[t] - pos[t - 1]] + am[t, pos[t]]
        probs.append((pos, np.exp(-cost)))
    z = sum(p for _, p in probs)
    for pos, p in probs:
        for t, a in enumerate(pos):
            ref_gamma[t, a] += p / z
    np.testing.assert_allclose(gamma[:T, :L], ref_gamma, atol=1e-9)
    np.testing.assert_allclose(log_z, np.log(z), atol=1e-9)


def test_padding_and_batch_invariance():
    """Posteriors are exact on padded batches: zero on pad frames/positions,
    sum to 1 on real frames, and identical to the unpadded single run."""
    dim = 4
    model = _toy_model(dim=dim, num_states=10, seed=5)
    pack = model.pack(dtype=jnp.float64)
    tdp = TdpModel(silence_state=0, loop=2.0, forward=0.0, skip=5.0)
    aut1 = MarkovAutomaton(states=np.array([0, 1, 2, 3, 4], np.int32))
    aut2 = MarkovAutomaton(states=np.array([0, 5, 6, 7, 8, 9, 1], np.int32))
    tables = AlignerTables.build([aut1, aut2], tdp)

    rng = np.random.default_rng(7)
    T = 14
    feats = rng.normal(0, 1, (2, T, dim)).astype(np.float32)
    lens = np.array([9, T], np.int32)
    feats[0, 9:] = 0.0

    gamma, log_z = baum_welch_posteriors(pack, feats, lens, tables,
                                         dtype=jnp.float64)
    gamma = np.asarray(gamma)
    sums = gamma.sum(axis=2)
    np.testing.assert_allclose(sums[0, :9], 1.0, atol=1e-12)
    np.testing.assert_allclose(sums[0, 9:], 0.0)
    np.testing.assert_allclose(sums[1], 1.0, atol=1e-12)
    assert np.all(gamma[0, :, 5:] == 0.0)  # padded positions of the short aut

    # single-utterance rerun must agree bitwise-closely
    t1 = AlignerTables.build([aut1], tdp)
    g1, z1 = baum_welch_posteriors(pack, feats[:1, :9], lens[:1] * 0 + 9, t1,
                                   dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(g1)[0], gamma[0, :9, :5], atol=1e-10)
    np.testing.assert_allclose(float(z1[0]), float(log_z[0]), atol=1e-9)


def test_sharp_limit_matches_viterbi():
    """Scaling all scores up concentrates the posterior on the Viterbi path."""
    lex = build_sietill_lexicon()
    model = _toy_model(dim=25, num_states=lex.num_states, seed=1)
    pack = model.pack(dtype=jnp.float64)
    tdp = TdpModel(silence_state=lex.silence_state, loop=3.0, forward=0.0,
                   skip=30.0)
    w = lex.automata[2]
    aut = MarkovAutomaton.concat([lex.automata[lex.silence_idx], w,
                                  lex.automata[lex.silence_idx]])
    tables = AlignerTables.build([aut], tdp)

    rng = np.random.default_rng(2)
    T = 40
    feats = rng.normal(0, 1, (1, T, 25)).astype(np.float32)
    lens = np.array([T], np.int32)

    vit_states, _ = align_batch(pack, feats, lens, tables,
                                pruning_threshold=None, tie_pruned=False,
                                dtype=jnp.float64)

    import dataclasses
    sharp = AlignerTables(states=tables.states, lengths=tables.lengths,
                          tdp=tables.tdp * 40.0)
    pack_sharp = dataclasses.replace(pack, P=pack.P * 40.0)
    gamma, _ = baum_welch_posteriors(pack_sharp, feats, lens, sharp,
                                     dtype=jnp.float64)
    bw_states = best_path_from_posteriors(np.asarray(gamma), tables)
    # the sharpened posterior's argmax path is the Viterbi path
    assert (bw_states[0] == vit_states[0]).mean() > 0.95


def test_one_hot_accumulation_matches_hard_path():
    """accumulate_baum_welch with a one-hot gamma equals accumulate_chunk on
    the corresponding hard alignment."""
    from speechrecognition_tpu.models.gmm import accumulate_chunk

    dim, L, T = 4, 5, 7
    model = _toy_model(dim=dim, num_states=L, seed=9)
    pack = model.pack(dtype=jnp.float64)
    states_tbl = jnp.asarray(np.array([[0, 1, 2, 3, 4]], np.int32))

    rng = np.random.default_rng(13)
    feats = rng.normal(0, 1, (1, T, dim)).astype(np.float32)
    pos_path = np.array([0, 0, 1, 2, 2, 3, 4])
    gamma = np.zeros((1, T, L), np.float64)
    gamma[0, np.arange(T), pos_path] = 1.0

    w, xs, x2s = accumulate_baum_welch(pack, jnp.asarray(feats),
                                       jnp.asarray(gamma), states_tbl)
    states_flat = np.asarray([0, 0, 1, 2, 2, 3, 4], np.int32)
    w2, xs2, x2s2 = accumulate_chunk(pack, jnp.asarray(feats[0]),
                                     jnp.asarray(states_flat),
                                     jnp.ones(T), first_pass=False)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x2s), np.asarray(x2s2), atol=1e-12)


def test_weight_threshold_prunes_and_renormalizes():
    dim, L, T = 4, 4, 6
    model = _toy_model(dim=dim, num_states=L, seed=3)
    pack = model.pack(dtype=jnp.float64)
    tdp = TdpModel(silence_state=99, loop=1.5, forward=0.0, skip=4.0)
    aut = MarkovAutomaton(states=np.arange(L, dtype=np.int32))
    tables = AlignerTables.build([aut], tdp)
    rng = np.random.default_rng(11)
    feats = rng.normal(0, 1, (1, T, dim)).astype(np.float32)
    lens = np.array([T], np.int32)
    gamma, _ = baum_welch_posteriors(pack, feats, lens, tables,
                                     weight_threshold=0.1, dtype=jnp.float64)
    gamma = np.asarray(gamma)[0]
    # zeroing sub-threshold mass shrinks the denominator, so every surviving
    # weight is at least the threshold
    assert np.all(gamma[gamma > 0] >= 0.1)
    np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-12)
