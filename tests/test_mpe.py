"""MPE accuracy-FSA scaffolding: brute-force path enumeration checks for
the approximate-accuracy forward-backward, plus a demo-scale MPE step."""

import itertools
import math

import numpy as np
import pytest

from speechrecognition_tpu.lexicon import build_sietill_lexicon
from speechrecognition_tpu.search.lattice import Arc, WordLattice
from speechrecognition_tpu.train.mpe import (approximate_word_accuracy,
                                             mpe_arc_gammas,
                                             reference_intervals,
                                             RefInterval)


def brute_force(lat, acc):
    """Enumerate all full paths; return (c_avg, {arc: gamma_mpe})."""
    paths = []

    def extend(t, arcs_so_far):
        if t == lat.num_frames:
            paths.append(list(arcs_so_far))
            return
        for a in lat.by_start().get(t, []):
            extend(a.end, arcs_so_far + [a])

    extend(0, [])
    probs = np.array([math.exp(-sum(a.score for a in p)) for p in paths])
    probs /= probs.sum()
    accs = np.array([sum(acc[a] for a in p) for p in paths])
    c_avg = float((probs * accs).sum())
    gmpe = {}
    for a in lat.arcs:
        on = np.array([a in p for p in paths])
        gamma = float(probs[on].sum())
        c_q = float((probs[on] * accs[on]).sum() / max(probs[on].sum(), 1e-300))
        gmpe[a] = gamma * (c_q - c_avg)
    return c_avg, gmpe


def test_accuracy_formula():
    refs = [RefInterval(word=3, start=0, end=10),
            RefInterval(word=5, start=10, end=20)]
    # exact match of ref word 3 over its full interval
    assert approximate_word_accuracy(Arc(0, 10, 3, 1.0), refs, 0) == 1.0
    # half-overlap, same word: -1 + 2*(5/10)
    assert approximate_word_accuracy(Arc(5, 15, 3, 1.0), refs, 0) == \
        pytest.approx(max(-1 + 2 * 0.5, -1 + 0.5))
    # wrong word, full overlap: -1 + 1
    assert approximate_word_accuracy(Arc(10, 20, 7, 1.0), refs, 0) == \
        pytest.approx(0.0)
    # silence arcs carry no accuracy
    assert approximate_word_accuracy(Arc(0, 20, 0, 1.0), refs, 0) == 0.0
    # no overlapping reference
    assert approximate_word_accuracy(Arc(30, 40, 3, 1.0), refs, 0) == 0.0


def test_reference_intervals_from_alignment():
    lex = build_sietill_lexicon()
    aut3 = lex.get_automaton_for_word(3)
    sil = lex.silence_state
    ali = np.concatenate([
        np.full(5, sil),
        np.asarray(aut3.states)[np.asarray([0, 0, 1, 2, 3])],
        np.full(4, sil),
        # the SAME word again — detected by the state index reset
        np.asarray(aut3.states)[np.asarray([0, 1, 1, 2])],
    ])
    refs = reference_intervals(ali, lex)
    assert refs == [RefInterval(3, 5, 10), RefInterval(3, 14, 18)]


def test_mpe_gammas_match_brute_force():
    rng = np.random.default_rng(7)
    # small diamond-shaped lattice over 6 frames
    arcs = [Arc(0, 3, 1, 2.0), Arc(0, 3, 2, 2.3), Arc(0, 6, 3, 4.9),
            Arc(3, 6, 2, 2.1), Arc(3, 6, 4, 2.4)]
    lat = WordLattice(num_frames=6, arcs=arcs, silence=0)
    refs = [RefInterval(1, 0, 3), RefInterval(2, 3, 6)]
    acc = {a: approximate_word_accuracy(a, refs, 0) for a in arcs}
    got, c_avg = mpe_arc_gammas(lat, acc)
    want_c, want = brute_force(lat, acc)
    assert c_avg == pytest.approx(want_c, abs=1e-9)
    for a in arcs:
        assert got[a] == pytest.approx(want[a], abs=1e-9), a
    # signs: arcs agreeing with the reference have better-than-average
    # accuracy → positive occupancy
    assert got[Arc(0, 3, 1, 2.0)] > 0
    assert got[Arc(0, 3, 2, 2.3)] < 0


def test_mpe_iteration_demo(lexicon, demo_corpus, fixtures_dir):
    """Demo-scale MPE step: expected accuracy must improve (the update
    pushes probability toward high-accuracy paths)."""
    from speechrecognition_tpu.io import read_alignment, read_mixture_set
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.tdp import TdpModel
    from speechrecognition_tpu.train.ebw import EbwConfig
    from speechrecognition_tpu.train.mpe import MpeTrainer

    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    ali, _w, _m = read_alignment(
        str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"))
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=3.0, forward=0.0, skip=30.0)
    cfg = EbwConfig(e_constant=2.0, i_smoothing_tau=10.0,
                    posterior_threshold=8.0, word_penalty=80.0,
                    am_threshold=200.0)
    trainer = MpeTrainer(cfg, lexicon, model, tdp)
    out = trainer.iterate(demo_corpus, ali)
    assert out["num_mass"] > 0 and out["den_mass"] > 0
    assert np.isfinite(out["expected_accuracy_before"])
    assert out["expected_accuracy_after"] >= out["expected_accuracy_before"]
