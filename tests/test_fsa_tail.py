"""Fsa tail: probability/count/integer semirings, Levenshtein,
arithmetic, sort, permute, random (fsa/{semiring,tail}.py vs
Fsa/Semiring.cc, Levenshtein.cc, Arithmetic.cc, Sort.cc, Permute.cc,
Random.cc)."""

import itertools

import numpy as np
import pytest

from speechrecognition_tpu.fsa.automaton import Automaton, linear_acceptor
from speechrecognition_tpu.fsa.ops import best_path
from speechrecognition_tpu.fsa.semiring import (CountSemiring,
                                                LogIntegerSemiring,
                                                ProbabilitySemiring,
                                                TropicalIntegerSemiring,
                                                get_semiring)
from speechrecognition_tpu.fsa.tail import (collect, extend, extend_final,
                                            expm, levenshtein,
                                            levenshtein_info, logm,
                                            multiply, permute, random_path,
                                            sort_arcs)


# -- semirings ----------------------------------------------------------------

def test_probability_semiring():
    sr = ProbabilitySemiring
    assert sr.plus(0.25, 0.5) == 0.75
    assert sr.times(0.25, 0.5) == 0.125
    assert sr.sum([0.1, 0.2, 0.3]) == pytest.approx(0.6)
    assert sr.zero == 0.0 and sr.one == 1.0


def test_count_semiring_saturates():
    sr = CountSemiring
    assert sr.plus(2, 3) == 5 and sr.times(2, 3) == 6
    assert sr.plus(sr.INF - 1, 5) == sr.INF
    assert sr.times(70000, 70000) == sr.INF
    assert sr.times(sr.INF, 0) == sr.INF     # reference: inf absorbs


def test_integer_semirings():
    assert TropicalIntegerSemiring.plus(4, 7) == 4
    assert TropicalIntegerSemiring.times(4, 7) == 11
    assert TropicalIntegerSemiring.times(2 ** 31 - 2, 5) == 2 ** 31 - 1
    a = LogIntegerSemiring.plus(10, 10)
    assert isinstance(a, int) and a < 10     # log-add lowers the score
    assert LogIntegerSemiring.plus(LogIntegerSemiring.zero, 42) == 42


def test_semiring_registry():
    assert get_semiring("probability") is ProbabilitySemiring
    with pytest.raises(ValueError):
        get_semiring("nope")


# -- Levenshtein --------------------------------------------------------------

def test_levenshtein_distance_and_info():
    ref = linear_acceptor([1, 2, 3, 4])
    hyp = linear_acceptor([1, 5, 4])       # sub(2→5), del(3)
    g = levenshtein(ref, hyp)
    _il, _ol, w = best_path(g)
    assert w == pytest.approx(2.0)
    info = levenshtein_info(g)
    assert info["total"] == 2
    assert info["sub"] == 1 and info["del"] == 1 and info["ins"] == 0


def test_levenshtein_matches_bruteforce():
    rng = np.random.RandomState(7)
    for _ in range(10):
        a = rng.randint(1, 4, rng.randint(1, 6)).tolist()
        b = rng.randint(1, 4, rng.randint(1, 6)).tolist()
        g = levenshtein(linear_acceptor(a), linear_acceptor(b))
        _il, _ol, w = best_path(g)
        # classic DP oracle
        D = np.zeros((len(a) + 1, len(b) + 1))
        D[:, 0] = np.arange(len(a) + 1)
        D[0, :] = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                              D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        assert w == pytest.approx(D[len(a), len(b)]), (a, b)


def test_levenshtein_custom_costs():
    g = levenshtein(linear_acceptor([1]), linear_acceptor([2]),
                    sub_cost=10.0, del_cost=3.0, ins_cost=4.0)
    _il, _ol, w = best_path(g)
    assert w == pytest.approx(7.0)         # del+ins beats the 10 sub


# -- arithmetic ---------------------------------------------------------------

def _toy_fsa():
    return linear_acceptor([1, 2], weights=[1.5, 2.5])


def test_extend_and_collect_and_multiply():
    a = _toy_fsa()
    e = extend(a, 1.0)                      # ⊗ in tropical = +
    assert np.allclose(e.weight, [2.5, 3.5])
    c = collect(e, 3.0)                     # ⊕ in tropical = min
    assert np.allclose(c.weight, [2.5, 3.0])
    m = multiply(a, 2.0)
    assert np.allclose(m.weight, [3.0, 5.0])


def test_expm_logm_roundtrip():
    a = _toy_fsa()
    r = logm(expm(a))
    assert np.allclose(r.weight, a.weight)


def test_extend_final_only_touches_finals():
    a = _toy_fsa()
    f = extend_final(a, 5.0)
    assert np.allclose(f.weight, a.weight)
    assert f.final[2] == a.final[2] + 5.0


# -- sort ---------------------------------------------------------------------

def test_sort_arcs_by_input():
    arcs = [(0, 1, 3, 0.5), (0, 1, 1, 0.2), (0, 2, 2, 0.1),
            (1, 2, 9, 0.0)]
    a = Automaton.build(3, arcs, {2: 0.0})
    s = sort_arcs(a, "by-input")
    assert s.ilabel[:3].tolist() == [1, 2, 3]
    assert s.src.tolist() == [0, 0, 0, 1]
    w = sort_arcs(a, "by-weight")
    assert w.weight[:3].tolist() == [0.1, 0.2, 0.5]
    with pytest.raises(ValueError):
        sort_arcs(a, "bogus")


# -- permute ------------------------------------------------------------------

def _accepted_strings(a: Automaton, max_len=6):
    """Enumerate accepted label strings (DFS, tiny automata only)."""
    out_idx = a.out_index()
    res = set()

    def dfs(s, acc):
        if np.isfinite(a.final[s]):
            res.add(tuple(acc))
        if len(acc) >= max_len:
            return
        for i in out_idx[s]:
            dfs(int(a.dst[i]), acc + [int(a.ilabel[i])])

    dfs(a.initial, [])
    return res


def test_permute_full_window_gives_all_permutations():
    a = linear_acceptor([1, 2, 3])
    p = permute(a)
    got = _accepted_strings(p)
    want = {tuple(x) for x in itertools.permutations([1, 2, 3])}
    assert got == want


def test_permute_window_limits_reordering():
    a = linear_acceptor([1, 2, 3, 4])
    p = permute(a, window_size=2)
    got = _accepted_strings(p, max_len=4)
    # window 2: only adjacent swaps of not-yet-consumed positions
    assert (1, 2, 3, 4) in got
    assert (2, 1, 3, 4) in got
    assert (4, 1, 2, 3) not in got
    # every accepted string is a permutation of the input
    assert all(sorted(g) == [1, 2, 3, 4] for g in got)


def test_permute_rejects_nonlinear():
    a = Automaton.build(2, [(0, 1, 1, 0.0), (0, 1, 2, 0.0)], {1: 0.0})
    with pytest.raises(ValueError):
        permute(a)


# -- random -------------------------------------------------------------------

def test_random_path_is_accepting_path():
    arcs = [(0, 1, 1, 0.5), (0, 1, 2, 0.1), (1, 2, 3, 0.0)]
    a = Automaton.build(3, arcs, {2: 0.0})
    for seed in range(5):
        p = random_path(a, seed=seed)
        labels = p.ilabel.tolist()
        assert labels in ([1, 3], [2, 3])


def test_random_path_weighted_prefers_cheap_arcs():
    arcs = [(0, 1, 1, 20.0), (0, 1, 2, 0.0), (1, 2, 3, 0.0)]
    a = Automaton.build(3, arcs, {2: 0.0})
    picks = [random_path(a, weight=1.0, seed=s).ilabel[0]
             for s in range(20)]
    assert picks.count(2) >= 18           # exp(−20) vs exp(0)


def test_random_path_maximum_size():
    # cyclic automaton: unbounded without the cap
    arcs = [(0, 0, 1, 0.0)]
    a = Automaton.build(1, arcs, {0: 0.0})
    p = random_path(a, maximum_size=5, seed=0)
    assert p.num_arcs <= 5
