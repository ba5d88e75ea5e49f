"""Word-lattice generation and operations on the demo corpus."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models import gmm as gmm_mod
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import DecoderTables
from speechrecognition_tpu.search.edit_distance import edit_distance
from speechrecognition_tpu.search.lattice import WordLattice
from speechrecognition_tpu.search.ngram_decoder import _decode_scan_bigram
from speechrecognition_tpu.tdp import TdpModel


@pytest.fixture(scope="module")
def lattices(lexicon, fixtures_dir, demo_corpus, demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=0, loop=c["tdp"][0], forward=c["tdp"][1],
                   skip=c["tdp"][2])
    pack = model.pack(dtype=jnp.float64)
    tables = DecoderTables.build(lexicon, tdp, word_penalty=0.0)
    W = lexicon.num_words
    lm = np.full((W, W), c["word_penalty"])
    lm[:, lexicon.silence_idx] = 0.0
    lm_start = lm[0].copy()

    feats, lens = demo_corpus.padded_batch(list(range(16)))
    B, T, dim = feats.shape
    am = gmm_mod.am_scores(pack, jnp.asarray(feats.reshape(B * T, dim)))
    am = am.reshape(B, T, pack.num_mixtures)
    scores, bkps, preds, offsets = _decode_scan_bigram(
        am, jnp.asarray(lens, jnp.int32),
        jnp.asarray(tables.state_table), jnp.asarray(tables.last_pos),
        jnp.asarray(tables.word_len), jnp.asarray(tables.first_state),
        jnp.asarray(tables.tdp_within), jnp.asarray(tables.entry_pen),
        jnp.asarray(lm), jnp.asarray(lm_start), jnp.asarray(200.0, jnp.float64))
    scores, bkps, offsets = map(np.asarray, (scores, bkps, offsets))
    lats = [WordLattice.from_books(scores[:, b], bkps[:, b], offsets[:, b],
                                   int(lens[b]), silence=lexicon.silence_idx)
            for b in range(B)]
    return lats, lens


def test_lattice_best_path_matches_golden(lattices, demo_recognition,
                                          lexicon):
    lats, lens = lattices
    golden = {u["idx"]: u["hyp"] for u in demo_recognition["utts"]}
    for b, lat in enumerate(lats):
        words, score = lat.best_path()
        hyp = [w for w in words if w != lexicon.silence_idx]
        assert hyp == golden[b], (b, hyp, golden[b])
        assert np.isfinite(score)


def test_nbest_ordering(lattices):
    lats, _ = lattices
    for lat in lats[:4]:
        nb = lat.n_best(5)
        assert len(nb) >= 1
        best_words, best_score = lat.best_path()
        assert abs(nb[0][1] - best_score) < 1e-6
        scores = [s for _w, s in nb]
        assert scores == sorted(scores)


def test_oracle_wer_bounds(lattices, demo_corpus, lexicon):
    lats, _ = lattices
    total_oracle = total_1best = total_ref = 0
    for b, lat in enumerate(lats):
        ref = demo_corpus.orths[b]
        words, _ = lat.best_path()
        hyp = [w for w in words if w != lexicon.silence_idx]
        ed = edit_distance(ref, hyp)
        oracle_err, R = lat.oracle_wer(ref)
        assert oracle_err <= ed.total_count
        total_oracle += oracle_err
        total_1best += ed.total_count
        total_ref += R
    # the lattice must contain strictly better paths than the 1-best overall
    assert total_oracle <= total_1best


def test_posterior_prune_keeps_best(lattices, lexicon):
    lats, _ = lattices
    for lat in lats[:4]:
        words, score = lat.best_path()
        pruned = lat.posterior_prune(threshold=50.0)
        pw, ps = pruned.best_path()
        assert pw == words
        assert abs(ps - score) < 1e-6
        assert len(pruned.arcs) <= len(lat.arcs)
