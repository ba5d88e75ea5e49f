"""Trigram LM perplexity on the shipped Europarl data (data/lm/).

Golden numbers come from running the reference's own LanguageModel.py
(mechanically ported py2→py3, no semantic edits) on identical input —
see bench/lm_europarl/RESULTS.md for the protocol. The reference's
training corpus is not shipped, so both implementations train on
data/lm/test (the only shipped corpus) and self-evaluate, which is a
full exercise of counting, discount estimation, back-off scoring and
the bigram perplexity loop (LanguageModel.py:319-344)."""

import os

import pytest

from speechrecognition_tpu.lm.ngram import CountLM, Vocabulary

TEST = "/root/reference/data/lm/test"
VOCAB = "/root/reference/data/lm/vocabulary"

pytestmark = pytest.mark.skipif(not os.path.exists(TEST),
                                reason="reference LM data not present")

GOLDEN_PERPLEXITY = 30.183212156887127
GOLDEN_DISCOUNTS = (0.6105544422177689, 0.7713337661400851,
                    0.8838776083091606)
GOLDEN_OOV_RATE = 0.01133122028526149


@pytest.fixture(scope="module")
def europarl_lm():
    lm = CountLM(order=3)
    lm.train(TEST, grow_vocab=True)
    return lm


def test_europarl_vocab_and_discounts(europarl_lm):
    assert europarl_lm.vocabulary.size() == 3585
    for got, ref in zip(europarl_lm.discounts, GOLDEN_DISCOUNTS):
        assert abs(got - ref) < 1e-12


def test_europarl_perplexity(europarl_lm):
    pp = europarl_lm.perplexity(TEST)
    assert abs(pp - GOLDEN_PERPLEXITY) < 1e-9


def test_europarl_unk_probability(europarl_lm):
    p = europarl_lm.prob(europarl_lm.vocabulary.unk, [])
    assert abs(p - 2.29140376208659e-05) < 1e-15


def test_europarl_unigram_normalization(europarl_lm):
    total = sum(europarl_lm.prob(w, [])
                for w in range(europarl_lm.vocabulary.size()))
    assert abs(total - 1.0) < 1e-9


def test_europarl_oov_rate_given_vocabulary():
    given = Vocabulary(VOCAB)
    assert given.size() == 46331
    lm = CountLM(order=3, vocabulary=given)
    with open(TEST) as f:
        for line in f:
            lm.add_sentence(line.strip().split(" "), grow_vocab=False)
    assert abs(lm.oov_rate - GOLDEN_OOV_RATE) < 1e-12
