"""Word-conditioned bigram decoder tests.

Invariant: with a constant LM row lm[v, w] = wp(w) (zerogram), the bigram
decoder must produce exactly the transcripts of the zerogram word-loop
decoder. With a real bigram LM trained on the reference transcripts, WER
on the demo corpus must not degrade.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.lm.ngram import CountLM, Vocabulary
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import DecoderTables, Recognizer
from speechrecognition_tpu.search.edit_distance import edit_distance
from speechrecognition_tpu.search.ngram_decoder import decode_batch_bigram
from speechrecognition_tpu.tdp import TdpModel


@pytest.fixture(scope="module")
def setup(lexicon, fixtures_dir, demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    pack = model.pack(dtype=jnp.float64)
    return pack, tdp, c


def test_uniform_lm_equals_zerogram(setup, lexicon, demo_corpus, demo_recognition):
    pack, tdp, c = setup
    W = lexicon.num_words
    wp = c["word_penalty"]
    lm = np.full((W, W), wp)
    lm[:, lexicon.silence_idx] = 0.0          # silence enters free
    lm_start = lm[0].copy()                   # same cost from the start

    tables0 = DecoderTables.build(lexicon, tdp, word_penalty=0.0)
    feats, lens = demo_corpus.padded_batch(list(range(35)))
    hyps_bigram = decode_batch_bigram(
        pack, feats, lens, tables0, lm, lm_start, c["am_threshold"],
        lexicon.silence_idx, dtype=jnp.float64)

    config = Configuration({"am-threshold": c["am_threshold"],
                            "word-penalty": wp, "pruned-search": True})
    rec = Recognizer(config, lexicon, tdp, pack, dtype=jnp.float64)
    res = rec.recognize_corpus(demo_corpus, batch_size=35)
    for s in range(35):
        assert hyps_bigram[s] == res["hyps"][s], (s, hyps_bigram[s], res["hyps"][s])


def test_bigram_lm_does_not_degrade(setup, lexicon, demo_corpus):
    pack, tdp, c = setup
    # train a bigram LM on the reference transcripts (digit strings)
    lm_model = CountLM(order=2)
    for orth in demo_corpus.orths:
        lm_model.add_sentence([lexicon.orth[w] for w in orth], grow_vocab=True)
    lm_model.estimate_discounts()

    W = lexicon.num_words
    sil = lexicon.silence_idx
    scale = 8.0   # LM scale ≈ word penalty magnitude
    lm = np.zeros((W, W))
    ids = [lm_model.vocabulary.index(lexicon.orth[w]) for w in range(W)]
    for v in range(W):
        for w in range(W):
            if v != sil and w != sil:
                lm[v, w] = scale * lm_model.score(ids[w], [ids[v]])
    lm[:, sil] = 0.0
    lm_start = np.zeros(W)
    for w in range(W):
        if w != sil:
            lm_start[w] = scale * lm_model.score(ids[w], [lm_model.vocabulary.start])
    # silence is LM-transparent-ish: re-entering a word after silence costs
    # its unigram score
    for w in range(W):
        if w != sil:
            lm[sil, w] = scale * lm_model.score(ids[w], [])

    tables0 = DecoderTables.build(lexicon, tdp, word_penalty=0.0)
    feats, lens = demo_corpus.padded_batch(list(range(35)))
    hyps = decode_batch_bigram(pack, feats, lens, tables0, lm, lm_start,
                               c["am_threshold"], lexicon.silence_idx,
                               dtype=jnp.float64)
    errors = 0
    total = 0
    for s in range(35):
        ed = edit_distance(demo_corpus.orths[s], hyps[s])
        errors += ed.total_count
        total += len(demo_corpus.orths[s])
    wer = 100.0 * errors / total
    # zerogram WER on this setup is 19.59% — a same-domain bigram must help
    assert wer <= 20.0, wer
