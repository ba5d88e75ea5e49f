"""Zerogram / FSA-grammar / class LM variants (Lm/Zerogram.cc, FsaLm.cc,
ClassLm.cc)."""

import math
import os

import numpy as np
import pytest

from speechrecognition_tpu.fsa.automaton import Automaton, EPS
from speechrecognition_tpu.lm.variants import (
    INVALID_HISTORY, ClassLM, ClassMapping, FsaLM, Zerogram)


def test_zerogram_uniform():
    lm = Zerogram(12)
    assert lm.score(3) == pytest.approx(math.log(12))
    tab = lm.score_table([[0], [1]], [0, 1, 2])
    assert tab.shape == (2, 3)
    assert np.allclose(tab, math.log(12))


def _grammar():
    # 0 --a/0.5--> 1 --b/0.25--> 2(final 0.125)
    # 0 --eps/1.0--> 3 --c/2.0--> 2
    return Automaton.build(4, [
        (0, 1, 0, 0.5),
        (0, 3, EPS, 1.0),
        (3, 2, 2, 2.0),
        (1, 2, 1, 0.25),
    ], final={2: 0.125})


def test_fsa_lm_direct_and_epsilon_paths():
    lm = FsaLM(_grammar())
    h = lm.start_history()
    # direct arc: label a=0
    assert lm.score(0, h) == pytest.approx(0.5)
    # label c=2 only reachable through the eps arc: 1.0 + 2.0
    assert lm.score(2, h) == pytest.approx(3.0)
    # label b=1 unreachable from start: eps target has no b and no eps
    assert lm.score(1, h) == math.inf

    h1 = lm.extended_history(h, 0)
    assert lm.score(1, h1) == pytest.approx(0.25)
    h2 = lm.extended_history(h1, 1)
    assert lm.sentence_end_score(h2) == pytest.approx(0.125)

    # leaving the grammar invalidates the history permanently (FsaLm.cc:104-108)
    bad = lm.extended_history(h, 1)
    assert bad == INVALID_HISTORY
    assert lm.score(0, bad) == math.inf
    assert lm.extended_history(bad, 0) == INVALID_HISTORY

    assert lm.sentence_score([0, 1]) == pytest.approx(0.5 + 0.25 + 0.125)
    assert lm.sentence_score([2]) == pytest.approx(3.0 + 0.125)
    assert lm.sentence_score([1]) == math.inf

    tab = lm.score_table([0, 1], [0, 1, 2])
    assert tab[0, 0] == pytest.approx(0.5)
    assert tab[1, 1] == pytest.approx(0.25)
    assert tab[0, 1] == math.inf


def test_class_mapping_load_normalize(tmp_path):
    path = os.path.join(tmp_path, "classes")
    with open(path, "w") as f:
        f.write("# comment line\n")
        f.write("one DIGIT 3\n")
        f.write("two DIGIT 1\n")
        f.write("; another comment\n")
        f.write("hello GREET\n")          # q defaults to 1.0
    vocab = ["one", "two", "hello", "stray"]
    m = ClassMapping.load(path, vocab)
    digit = m.class2int["DIGIT"]
    assert m.class_of[0] == digit and m.class_of[1] == digit
    # normalization: q=3/(3+1), 1/(3+1) (ClassLm.cc:120-133)
    assert m.emission[0] == pytest.approx(-math.log(0.75))
    assert m.emission[1] == pytest.approx(-math.log(0.25))
    # single-member classes normalize to q=1 → score 0
    assert m.emission[2] == pytest.approx(0.0)
    # unmapped word gets an identity class with q=1 (ClassLm.cc:98-119)
    stray_cls = int(m.class_of[3])
    assert m.classes[stray_cls] == "stray"
    assert m.emission[3] == pytest.approx(0.0)


def test_class_lm_combines_emission_and_class_score(tmp_path):
    path = os.path.join(tmp_path, "classes")
    with open(path, "w") as f:
        f.write("one DIGIT 1\ntwo DIGIT 1\nhello GREET\n")
    vocab = ["one", "two", "hello"]
    m = ClassMapping.load(path, vocab)
    base = Zerogram(len(m.classes))
    lm = ClassLM(m, base, emission_scale=2.0)
    # p = q^2 · p_class: −ln = 2·(−ln 0.5) + ln(num_classes)
    expect = 2.0 * (-math.log(0.5)) + math.log(len(m.classes))
    assert lm.score(0, [2]) == pytest.approx(expect)
    tab = lm.score_table([[2], [0]], [0, 1, 2])
    assert tab.shape == (2, 3)
    assert tab[0, 0] == pytest.approx(expect)
    # GREET is a singleton class: emission 0, pure class score
    assert tab[0, 2] == pytest.approx(math.log(len(m.classes)))
