"""Lazy (on-demand) automata, alphabets, and Fsa archives.

Invariants:
  * lazy compose/determinize materialize exactly the eager results on
    random automata (agreement fuzz);
  * lazy determinize + best-first search solves an automaton whose FULL
    determinization blows past the eager guard, touching only a few
    subset states — the on-demand payoff (Fsa/Automaton.hh design);
  * alphabets and text archives round-trip automata by name.
"""

import numpy as np
import pytest

from speechrecognition_tpu.fsa.alphabet import (Alphabet, FsaArchive,
                                                read_fsa_text,
                                                write_fsa_text)
from speechrecognition_tpu.fsa.automaton import EPS, Automaton
from speechrecognition_tpu.fsa.lazy import (LazyStatic, best_path_lazy,
                                            lazy_compose, lazy_determinize,
                                            materialize)
from speechrecognition_tpu.fsa.ops import (best_path, compose, connect,
                                           determinize, is_deterministic)

RNG = np.random.default_rng(17)


def random_acceptor(n_states=6, n_arcs=12, n_labels=3, seed=None):
    rng = np.random.default_rng(seed)
    arcs = []
    for _ in range(n_arcs):
        arcs.append((int(rng.integers(n_states)), int(rng.integers(n_states)),
                     int(rng.integers(n_labels)),
                     float(rng.random())))
    final = {n_states - 1: float(rng.random())}
    return connect(Automaton.build(n_states, arcs, final, 0))


def test_lazy_static_matches_eager():
    for seed in range(10):
        a = random_acceptor(seed=seed)
        if a.num_states == 0:
            continue
        m = materialize(LazyStatic(a))
        assert m.num_arcs == connect(a).num_arcs
        w_e = best_path(a)[2]
        labels, w_l = best_path_lazy(LazyStatic(a))
        assert w_l == pytest.approx(w_e, abs=1e-9)


def test_lazy_compose_matches_eager():
    hits = 0
    for seed in range(20):
        a = random_acceptor(seed=100 + seed)
        b = random_acceptor(seed=200 + seed)
        if a.num_states == 0 or b.num_states == 0:
            continue
        e = connect(compose(a, b))
        lz = lazy_compose(LazyStatic(a), LazyStatic(b))
        try:
            m = connect(materialize(lz))
        except RuntimeError:
            continue
        # same best score (state numbering may differ)
        if e.num_states == 0:
            assert m.num_states == 0 or not np.isfinite(best_path(m)[2])
            continue
        hits += 1
        assert best_path(m)[2] == pytest.approx(best_path(e)[2], abs=1e-9)
    assert hits >= 5


def random_acyclic_acceptor(n_states=8, n_arcs=16, n_labels=3, seed=None):
    """Acyclic random acceptor: weighted determinization of CYCLIC
    automata needn't terminate (non-twins residuals — exactly what the
    eager guard catches), so the agreement fuzz stays acyclic."""
    rng = np.random.default_rng(seed)
    arcs = []
    for _ in range(n_arcs):
        s = int(rng.integers(n_states - 1))
        d = int(rng.integers(s + 1, n_states))
        arcs.append((s, d, int(rng.integers(n_labels)), float(rng.random())))
    final = {n_states - 1: float(rng.random())}
    return connect(Automaton.build(n_states, arcs, final, 0))


def test_lazy_determinize_matches_eager():
    for seed in range(10):
        a = random_acyclic_acceptor(seed=300 + seed)
        if a.num_states == 0:
            continue
        e = determinize(a)
        m = materialize(lazy_determinize(LazyStatic(a)))
        assert is_deterministic(m)
        assert m.num_states == e.num_states
        assert best_path(m)[2] == pytest.approx(best_path(e)[2], abs=1e-9)


def test_lazy_determinize_avoids_blowup():
    """The classic 2^n family ("the n-th symbol from the end is `a`"):
    eager determinization trips its guard, but lazy determinize +
    best-first search finds the cheap side branch after materializing a
    handful of subset states — the Fsa::Automaton on-demand payoff."""
    n = 18
    arcs = [(0, 0, 0, 2.0), (0, 0, 1, 2.0),    # self loops
            (0, 1, 0, 2.0)]                     # nondeterministic start
    for i in range(1, n):
        arcs.append((i, i + 1, 0, 2.0))
        arcs.append((i, i + 1, 1, 2.0))
    CHEAP = n + 1
    arcs.append((0, CHEAP, 2, 1.0))             # cheap escape branch
    a = Automaton.build(n + 2, arcs, {n: 0.0, CHEAP: 0.0}, 0)

    with pytest.raises(RuntimeError):
        determinize(a, max_states=2000)

    lz = lazy_determinize(LazyStatic(a))
    labels, score = best_path_lazy(lz, max_expansions=5000)
    assert score == pytest.approx(1.0, abs=1e-12)
    assert labels == [2]
    assert lz.num_materialized <= 4, lz.num_materialized


def test_alphabet_and_archive_roundtrip(tmp_path):
    alpha = Alphabet(["[sil]", "eins", "zwei"])
    assert alpha.index("eins") == 1
    assert alpha.symbol(EPS) == Alphabet.EPS_SYMBOL
    assert alpha.add(Alphabet.EPS_SYMBOL) == EPS

    a = random_acceptor(seed=7)
    arch = FsaArchive(str(tmp_path / "fsas"), alpha)
    arch.write("g/one", a)
    back = FsaArchive.open(str(tmp_path / "fsas")).read("g/one")
    assert back.num_states == a.num_states
    assert back.num_arcs == a.num_arcs
    np.testing.assert_allclose(back.weight, a.weight, rtol=1e-6)
    np.testing.assert_array_equal(back.ilabel, a.ilabel)
    assert arch.list() == ["g/one"]
    assert best_path(back)[2] == pytest.approx(best_path(a)[2], abs=1e-6)
