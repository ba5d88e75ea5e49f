"""Language-model toolkit tests: count LM invariants + ARPA scorer."""

import math
import os

import numpy as np
import pytest

from speechrecognition_tpu.lm.ngram import CountLM, Vocabulary
from speechrecognition_tpu.lm.arpa import ArpaLM

LM_DATA = "/root/reference/data/lm"
AN4_LM = "/root/reference/src/example-setup/data/an4.2.20081121.lm"


@pytest.fixture(scope="module")
def toy_lm(tmp_path_factory):
    """Train the trigram LM on the shipped Europarl test sentences (the
    train corpus is not shipped; semantics are what we verify)."""
    lm = CountLM(order=3)
    with open(os.path.join(LM_DATA, "test")) as f:
        for line in f:
            lm.add_sentence(line.strip().split(" "), grow_vocab=True)
    lm.estimate_discounts()
    return lm


def test_vocabulary_specials():
    v = Vocabulary()
    assert v.start == 0 and v.end == 1 and v.unk == 2
    a = v.add_symbol("hello")
    assert v.add_symbol("hello") == a
    assert v.word_frequencies[a] == 2
    assert v.index("nope") == v.unk


def test_discounts_in_range(toy_lm):
    assert len(toy_lm.discounts) == 3
    for d in toy_lm.discounts:
        assert 0.0 < d < 1.0


def test_probabilities_normalize(toy_lm):
    """Σ_w p(w | h) ≈ 1 (the reference prints these sums as its own sanity
    check, LanguageModel.py:75-80)."""
    V = toy_lm.vocabulary.size()
    uni = sum(toy_lm.prob(w, []) for w in range(V))
    assert abs(uni - 1.0) < 1e-9
    big = sum(toy_lm.prob(w, [5]) for w in range(V))
    assert abs(big - 1.0) < 1e-9
    tri = sum(toy_lm.prob(w, [toy_lm.vocabulary.start, 5]) for w in range(V))
    assert abs(tri - 1.0) < 1e-6


def test_perplexity_sane(toy_lm):
    pp = toy_lm.perplexity(os.path.join(LM_DATA, "test"))
    # self-perplexity of the training text must be low but > 1
    assert 1.0 < pp < 100.0


def test_unknown_word_prob(toy_lm):
    p = toy_lm.prob(toy_lm.vocabulary.unk, [])
    assert 0.0 < p < 1.0


@pytest.mark.skipif(not os.path.exists(AN4_LM), reason="AN4 LM not present")
def test_arpa_an4():
    lm = ArpaLM(AN4_LM)
    assert lm.order >= 2
    assert len(lm.ngrams[0]) > 10
    s = lm.score_str("A", ["<s>"]) if "A" in lm.word2int else None
    # every listed unigram must have a finite score
    some = list(lm.ngrams[0].keys())[:50]
    for (w,) in some:
        val = lm.score(w, [])
        assert np.isfinite(val)
    # backoff path: unseen bigram falls back to unigram + bow
    words = [w for (w,) in some]
    if len(words) >= 2:
        val = lm.score(words[0], [words[1]])
        assert np.isfinite(val)
