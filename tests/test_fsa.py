"""Fsa mini-library tests: rational ops, compose, determinize, minimize,
epsilon removal, shortest/n-best paths, pruning, IO — checked against
brute-force path enumeration on small machines, plus the lattice bridge."""

import itertools

import numpy as np
import pytest

from speechrecognition_tpu.fsa import (EPS, Automaton, LogSemiring,
                                       TropicalSemiring, best_path, closure,
                                       compose, concat, connect, determinize,
                                       draw, invert, is_deterministic,
                                       linear_acceptor, minimize, n_best,
                                       project, prune, read_fsa,
                                       remove_epsilons, reverse,
                                       shortest_distance, union, write_fsa)
from speechrecognition_tpu.fsa.ops import from_word_lattice, push


def enumerate_paths(a: Automaton, max_len: int = 8):
    """Brute-force: best weight per accepted ilabel-sequence."""
    best = {}
    stack = [(a.initial, (), 0.0)]
    while stack:
        s, labs, w = stack.pop()
        if np.isfinite(a.final[s]):
            t = w + float(a.final[s])
            if labs not in best or t < best[labs]:
                best[labs] = t
        if len(labs) >= max_len:
            continue
        for i in range(a.num_arcs):
            if a.src[i] == s:
                lab = int(a.ilabel[i])
                nl = labs if lab == EPS else labs + (lab,)
                stack.append((int(a.dst[i]), nl, w + float(a.weight[i])))
    return best


def random_acceptor(rng, num_states=5, num_arcs=10, num_labels=3,
                    with_eps=False):
    arcs = []
    for _ in range(num_arcs):
        s = int(rng.integers(num_states))
        d = int(rng.integers(num_states))
        lab = int(rng.integers(num_labels)) + 1
        if with_eps and rng.random() < 0.2:
            lab = EPS
        arcs.append((s, d, lab, float(np.round(rng.random() * 4, 3))))
    # forward-biased arcs so languages stay finite-ish; force acyclic
    arcs = [(min(s, d), max(s, d) + (1 if s == d else 0), l, w)
            for s, d, l, w in arcs]
    arcs = [(s, d, l, w) for s, d, l, w in arcs if d < num_states and s != d]
    final = {num_states - 1: 0.0}
    return Automaton.build(num_states, arcs, final)


def test_linear_acceptor_and_best():
    a = linear_acceptor([3, 1, 2], [0.5, 0.25, 0.125])
    il, ol, w = best_path(a)
    assert il == [3, 1, 2] and ol == [3, 1, 2]
    assert w == pytest.approx(0.875)
    assert a.accepts([3, 1, 2]) == pytest.approx(0.875)
    assert a.accepts([3, 1]) == np.inf


def test_union_concat_closure():
    a = linear_acceptor([1], [1.0])
    b = linear_acceptor([2], [2.0])
    u = union(a, b)
    pu = enumerate_paths(u)
    assert pu == {(1,): pytest.approx(1.0), (2,): pytest.approx(2.0)}
    c = concat(a, b)
    pc = enumerate_paths(c)
    assert pc == {(1, 2): pytest.approx(3.0)}
    k = closure(a)
    pk = enumerate_paths(k, max_len=4)
    assert pk[()] == pytest.approx(0.0)
    assert pk[(1,)] == pytest.approx(1.0)
    assert pk[(1, 1, 1)] == pytest.approx(3.0)


def test_compose_acceptors_intersect():
    # acceptor A: (1|2) 3 ; acceptor B: 2 3 — intersection = {2 3}
    a = Automaton.build(3, [(0, 1, 1, 0.5), (0, 1, 2, 0.25), (1, 2, 3, 0.0)],
                        {2: 0.0})
    b = linear_acceptor([2, 3], [1.0, 1.0])
    c = compose(a, b)
    paths = enumerate_paths(c)
    assert paths == {(2, 3): pytest.approx(2.25)}


def test_compose_transducer_relabels():
    # T1: 1→10; T2: 10→77
    t1 = Automaton.build(2, [(0, 1, 1, 10, 0.5)], {1: 0.0})
    t2 = Automaton.build(2, [(0, 1, 10, 77, 0.25)], {1: 0.0})
    c = compose(t1, t2)
    il, ol, w = best_path(c)
    assert il == [1] and ol == [77] and w == pytest.approx(0.75)


def test_remove_epsilons_preserves_language():
    rng = np.random.default_rng(7)
    for trial in range(10):
        a = random_acceptor(rng, with_eps=True)
        b = remove_epsilons(a)
        assert not ((b.ilabel == EPS) & (b.olabel == EPS)).any()
        pa = enumerate_paths(a)
        pb = enumerate_paths(b)
        assert set(pa) == set(pb), trial
        for k in pa:
            assert pa[k] == pytest.approx(pb[k]), (trial, k)


def test_determinize_preserves_weights():
    rng = np.random.default_rng(11)
    for trial in range(10):
        a = random_acceptor(rng, with_eps=(trial % 2 == 0))
        d = determinize(a)
        assert is_deterministic(d)
        pa = enumerate_paths(a)
        pd = enumerate_paths(d)
        assert set(pa) == set(pd), trial
        for k in pa:
            assert pa[k] == pytest.approx(pd[k]), (trial, k)


def test_minimize_preserves_and_shrinks():
    # two redundant branches accepting the same strings
    a = Automaton.build(
        5, [(0, 1, 1, 1.0), (0, 2, 1, 1.0), (1, 3, 2, 0.5), (2, 4, 2, 0.5)],
        {3: 0.0, 4: 0.0})
    m = minimize(a)
    assert m.num_states < connect(a).num_states
    pa = enumerate_paths(a)
    pm = enumerate_paths(m)
    assert set(pa) == set(pm)
    for k in pa:
        assert pa[k] == pytest.approx(pm[k])

    rng = np.random.default_rng(13)
    for trial in range(8):
        a = random_acceptor(rng)
        m = minimize(a)
        pa = enumerate_paths(a)
        pm = enumerate_paths(m)
        assert set(pa) == set(pm), trial
        for k in pa:
            assert pa[k] == pytest.approx(pm[k]), (trial, k)


def test_push_preserves_total_weights():
    rng = np.random.default_rng(3)
    a = random_acceptor(rng)
    p = push(a)
    pa = enumerate_paths(a)
    pp = enumerate_paths(p)
    for k in pa:
        assert pa[k] == pytest.approx(pp[k])


def test_shortest_distance_log_semiring():
    # two parallel paths with -log weights 1 and 2 → -log(e^-1 + e^-2)
    a = Automaton.build(2, [(0, 1, 1, 1.0), (0, 1, 2, 2.0)], {1: 0.0})
    d = shortest_distance(a, semiring=LogSemiring)
    assert d[1] == pytest.approx(-np.log(np.exp(-1.0) + np.exp(-2.0)))
    dt = shortest_distance(a, semiring=TropicalSemiring)
    assert dt[1] == pytest.approx(1.0)


def test_n_best():
    a = Automaton.build(3, [(0, 1, 1, 1.0), (0, 1, 2, 2.0), (1, 2, 3, 0.0),
                            (1, 2, 4, 0.5)], {2: 0.0})
    nb = n_best(a, 3)
    assert [labs for labs, _w in nb] == [[1, 3], [1, 4], [2, 3]]
    assert [w for _l, w in nb] == pytest.approx([1.0, 1.5, 2.0])


def test_prune_keeps_best():
    a = Automaton.build(3, [(0, 1, 1, 0.0), (0, 1, 2, 5.0), (1, 2, 3, 0.0)],
                        {2: 0.0})
    p = prune(a, 1.0)
    paths = enumerate_paths(p)
    assert set(paths) == {(1, 3)}
    p2 = prune(a, 10.0)
    assert set(enumerate_paths(p2)) == {(1, 3), (2, 3)}


def test_reverse_project_invert():
    t = Automaton.build(3, [(0, 1, 1, 9, 0.5), (1, 2, 2, 8, 0.25)], {2: 0.125})
    r = reverse(t)
    il, _, w = best_path(r)
    assert il == [2, 1] and w == pytest.approx(0.875)
    pi = project(t, "output")
    il, ol, _ = best_path(pi)
    assert il == [9, 8] and ol == [9, 8]
    iv = invert(t)
    il, ol, _ = best_path(iv)
    assert il == [9, 8] and ol == [1, 2]


def test_io_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    a = random_acceptor(rng)
    path = str(tmp_path / "a.fsa")
    write_fsa(path, a)
    b = read_fsa(path)
    assert b.num_states == a.num_states and b.num_arcs == a.num_arcs
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.ilabel, b.ilabel)
    np.testing.assert_allclose(a.weight, b.weight)
    np.testing.assert_allclose(a.final, b.final)


def test_draw_dot():
    a = linear_acceptor([1, 2], [0.5, 0.5])
    dot = draw(a, symbols={1: "eins", 2: "zwei"})
    assert dot.startswith("digraph")
    assert "eins" in dot and "zwei" in dot


def test_from_word_lattice_best_matches():
    from speechrecognition_tpu.search.lattice import Arc, WordLattice
    arcs = [Arc(0, 3, 5, 1.0), Arc(0, 3, 6, 2.0), Arc(3, 7, 5, 0.5),
            Arc(3, 7, 7, 0.25)]
    lat = WordLattice(num_frames=7, arcs=arcs, silence=0)
    fsa = from_word_lattice(lat)
    il, _, w = best_path(fsa)
    words, score = lat.best_path()
    assert w == pytest.approx(score)
    assert il == words or [x for x in il if x != lat.silence] == words
