"""Allophone-state graph builder (Speech/AllophoneStateGraphBuilder.cc,
Am/ClassicTransducerBuilder.cc): orth → tied-state chains / weighted FSAs,
and Sprint-mode alignment over the AN4 fixtures."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

DATA = "/root/reference/src/example-setup/data"
needs_an4 = pytest.mark.skipif(not os.path.isdir(DATA), reason="AN4 data absent")


@pytest.fixture(scope="module")
def builder():
    from speechrecognition_tpu.sprint import BlissLexicon, DecisionTree
    from speechrecognition_tpu.sprint.am import (AllophoneStateModel,
                                                 StateTypeTdp, TransitionModel)
    from speechrecognition_tpu.sprint.state_graph import AllophoneStateGraphBuilder

    bliss = BlissLexicon.read(f"{DATA}/an4.20081021.lexicon")
    tree = DecisionTree.read(f"{DATA}/cart.1.tree")
    asm = AllophoneStateModel(bliss=bliss, tree=tree)
    tm = TransitionModel(
        default=StateTypeTdp(loop=3.0, forward=0.0, skip=30.0, exit=150.0),
        silence=StateTypeTdp(loop=0.0001, forward=3.0, skip=float("inf"),
                             exit=15.0),
        entry_m1=StateTypeTdp(), entry_m2=StateTypeTdp())
    return AllophoneStateGraphBuilder(model=asm, transition=tm)


@needs_an4
def test_chain_structure(builder):
    sil = builder._silence_states()
    assert len(sil) == 3  # 1 silence phone × 3 HMM states
    chain = builder.chain_for_orth(["A"])
    # sil + 1-phoneme word (3 states) + sil
    assert chain.num_states == 3 + 3 + 3
    chain2 = builder.chain_for_orth(["A", "B"])
    b_len = len(builder._pron_states("B"))
    assert chain2.num_states == 3 + 3 + 3 + b_len + 3
    # chain without silence
    bare = builder.chain_for_orth(["A"], silence_between=False)
    assert bare.num_states == 3


@needs_an4
def test_fsa_weights_and_topology(builder):
    fsa = builder.build_fsa(["A"])
    n = fsa.num_states
    assert n == 9
    # every state has a loop arc; inner states have forward+skip
    loops = (fsa.src == fsa.dst).sum()
    assert loops == n
    # silence loop weight is the silence TDP, word loop the default
    w_loop0 = fsa.weight[(fsa.src == 0) & (fsa.dst == 0)][0]
    assert w_loop0 == pytest.approx(0.0001)
    w_loop4 = fsa.weight[(fsa.src == 4) & (fsa.dst == 4)][0]
    assert w_loop4 == pytest.approx(3.0)
    # final weight = exit TDP of the trailing silence
    assert fsa.final[n - 1] == pytest.approx(15.0)
    # a straight-through label sequence is accepted at the forward-cost sum
    chain = builder.chain_for_orth(["A"])
    labels = [int(s) for s in chain.states]
    cost = fsa.accepts(labels)
    assert np.isfinite(cost)


@needs_an4
def test_alignment_fsas(builder):
    from speechrecognition_tpu.sprint.state_graph import AllophoneStateGraphBuilder

    states = np.array([5, 5, 7, 9], np.int32)
    lin = AllophoneStateGraphBuilder.alignment_fsa(states, scores=[1, 2, 3, 4])
    assert lin.num_states == 5 and lin.num_arcs == 4
    assert lin.accepts([5, 5, 7, 9]) == pytest.approx(10.0)

    gamma = np.array([[0.7, 0.3, 0.0], [0.0, 1.0, 0.0]])
    saus = AllophoneStateGraphBuilder.alignment_posterior_fsa(
        gamma, np.array([11, 12, 13]))
    assert saus.num_states == 3
    # per-frame arc weights are −log posterior and sum to ≈1 in prob space
    for t in range(2):
        sel = saus.src == t
        assert np.exp(-saus.weight[sel]).sum() == pytest.approx(1.0)


@needs_an4
def test_baum_welch_alignment_over_an4(builder):
    """Sprint-mode soft alignment over real AN4 cache features: train a
    1-density tied GMM from a linear mapping, then Baum-Welch align and
    check the posteriors are a proper soft refinement of the chain."""
    from speechrecognition_tpu.align.baumwelch import (baum_welch_posteriors,
                                                       best_path_from_posteriors)
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.sprint import BlissCorpus, FeatureCache
    from speechrecognition_tpu.sprint.state_graph import aligner_tables_for_orths

    corpus = BlissCorpus.read(f"{DATA}/an4_test.20081021.corpus.gz")
    cache = FeatureCache(f"{DATA}/mfcc.features.recognition.cache")
    segs = corpus.segments[:3]
    feats_list = [cache.read_features(corpus.full_segment_name(s))[0]
                  for s in segs]
    orths = [list(s.orth) for s in segs]

    tables = aligner_tables_for_orths(builder, orths)
    num_classes = builder.model.num_classes
    dim = feats_list[0].shape[1]

    # linear-segmentation init: map frames evenly onto chain positions
    model = MixtureModel(dim=dim, num_mixtures=num_classes,
                         var_model=VarianceModel.GLOBAL_POOLING,
                         max_approx=True)
    model.mean_weight_acc[:] = 1e-3
    model.var_weight_acc[:] = 1e-3
    model.var_acc[:] = 1e-3
    for f, (states_row, n) in zip(
            feats_list, zip(tables.states, tables.lengths)):
        T = f.shape[0]
        pos = np.minimum((np.arange(T) * n) // T, n - 1)
        st = states_row[pos]
        for s in range(num_classes):
            m = st == s
            if m.any():
                model.mean_weight_acc[s] += m.sum()
                model.mean_acc[s] += f[m].sum(axis=0)
                # GLOBAL_POOLING: one shared variance accumulator
                model.var_weight_acc[0] += m.sum()
                model.var_acc[0] += (f[m] ** 2).sum(axis=0)
    model.finalize()
    pack = model.pack(dtype=jnp.float64)

    T = max(f.shape[0] for f in feats_list)
    B = len(feats_list)
    feats = np.zeros((B, T, dim), np.float32)
    lens = np.zeros(B, np.int32)
    for i, f in enumerate(feats_list):
        feats[i, : f.shape[0]] = f
        lens[i] = f.shape[0]

    gamma, log_z = baum_welch_posteriors(pack, feats, lens, tables,
                                         dtype=jnp.float64)
    gamma = np.asarray(gamma)
    for b in range(B):
        np.testing.assert_allclose(
            gamma[b, : lens[b]].sum(axis=1), 1.0, atol=1e-9)
    assert np.isfinite(np.asarray(log_z)).all()
    # the argmax path is monotone over chain positions
    pos = gamma.argmax(axis=2)
    for b in range(B):
        steps = np.diff(pos[b, : lens[b]])
        assert (steps >= 0).all() and (steps <= 2).all()
    # and it is a valid state path through the chain
    best = best_path_from_posteriors(gamma, tables)
    assert best.shape == (B, T)
