"""Word-conditioned tree search tests.

Invariants:
  * with a uniform LM row (zerogram) the WCTS reproduces the word-loop
    decoder's transcripts;
  * with a real bigram LM it reproduces the linear bigram decoder
    (search/ngram_decoder.py) exactly — SieTill has no whole-word
    prefixes, so the two search spaces coincide;
  * LM lookahead pruning at the standard beam changes nothing, and the
    compressed lookahead structure has the expected shape.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.lm.ngram import CountLM
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import DecoderTables, Recognizer
from speechrecognition_tpu.search.ngram_decoder import decode_batch_bigram
from speechrecognition_tpu.search.tree_decoder import TreeTables
from speechrecognition_tpu.search.wcts import (LookaheadTables,
                                               decode_batch_wcts, extend_lm)
from speechrecognition_tpu.tdp import TdpModel


@pytest.fixture(scope="module")
def setup(lexicon, fixtures_dir, demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    return model.pack(dtype=jnp.float64), tdp, c


@pytest.fixture(scope="module")
def bigram_lm(lexicon, demo_corpus):
    """Bigram LM on the demo transcripts (same construction as the
    ngram-decoder test)."""
    lm_model = CountLM(order=2)
    for orth in demo_corpus.orths:
        lm_model.add_sentence([lexicon.orth[w] for w in orth], grow_vocab=True)
    lm_model.estimate_discounts()
    W = lexicon.num_words
    sil = lexicon.silence_idx
    scale = 8.0
    ids = [lm_model.vocabulary.index(lexicon.orth[w]) for w in range(W)]
    lm = np.zeros((W, W))
    for v in range(W):
        for w in range(W):
            if v != sil and w != sil:
                lm[v, w] = scale * lm_model.score(ids[w], [ids[v]])
    lm[:, sil] = 0.0
    lm_start = np.zeros(W)
    for w in range(W):
        if w != sil:
            lm_start[w] = scale * lm_model.score(ids[w],
                                                 [lm_model.vocabulary.start])
            lm[sil, w] = scale * lm_model.score(ids[w], [])
    return lm, lm_start


def test_uniform_lm_equals_word_loop(setup, lexicon, demo_corpus,
                                     demo_recognition):
    pack, tdp, c = setup
    W = lexicon.num_words
    wp = c["word_penalty"]
    lm = np.full((W, W), wp)
    lm[:, lexicon.silence_idx] = 0.0
    lm_start = lm[0].copy()

    tables = TreeTables.build(lexicon, tdp, word_penalty=0.0)
    feats, lens = demo_corpus.padded_batch(list(range(35)))
    hyps = decode_batch_wcts(pack, feats, lens, tables, tdp, lm, lm_start,
                             c["am_threshold"], lexicon.silence_idx,
                             dtype=jnp.float64)
    golden = {u["idx"]: u["hyp"] for u in demo_recognition["utts"]}
    for b in range(35):
        assert hyps[b] == golden[b], (b, hyps[b], golden[b])


def test_bigram_equals_linear_search(setup, lexicon, demo_corpus, bigram_lm):
    """Exact bigram Viterbi two ways: LM at entry over per-word linear
    copies (LinearSearch) vs LM at exit over predecessor-conditioned tree
    copies (WCTS). Transcripts must match, pruned and unpruned."""
    pack, tdp, c = setup
    lm, lm_start = bigram_lm
    feats, lens = demo_corpus.padded_batch(list(range(35)))

    lin_tables = DecoderTables.build(lexicon, tdp, word_penalty=0.0)
    tree_tables = TreeTables.build(lexicon, tdp, word_penalty=0.0)

    for prune in (False, True):
        hyps_lin = decode_batch_bigram(
            pack, feats, lens, lin_tables, lm, lm_start, c["am_threshold"],
            lexicon.silence_idx, prune=prune, dtype=jnp.float64)
        hyps_tree = decode_batch_wcts(
            pack, feats, lens, tree_tables, tdp, lm, lm_start,
            c["am_threshold"], lexicon.silence_idx, prune=prune,
            dtype=jnp.float64)
        for b in range(35):
            assert hyps_tree[b] == hyps_lin[b], (prune, b, hyps_tree[b],
                                                 hyps_lin[b])


def test_lookahead_structure(lexicon, setup):
    _, tdp, _ = setup
    tables = TreeTables.build(lexicon, tdp, word_penalty=0.0)
    la = LookaheadTables.build(tables)
    # SieTill has no shared prefixes: every node anticipates exactly one
    # word → unique word-sets = 12 singletons + the root's full set
    assert la.num_tables == lexicon.num_words + 1
    assert la.word_sets.sum(axis=1).max() == lexicon.num_words
    # scores: root row = min over all words; leaf = its own word's score
    lm_ext = extend_lm(np.arange(144, dtype=float).reshape(12, 12) / 10.0,
                       np.zeros(12))
    scores = la.scores(lm_ext)
    assert scores.shape == (13, tables.num_nodes)
    np.testing.assert_allclose(scores[:, 0], lm_ext.min(axis=1))
    for w in range(lexicon.num_words):
        n = int(tables.end_node[w])
        np.testing.assert_allclose(scores[:, n], lm_ext[:, w])

    # cutoff: depth-1 compression collapses every word to its first node
    la1 = LookaheadTables.build(tables, cutoff_depth=1)
    assert la1.num_tables <= la.num_tables


def test_histogram_pruning_ranks_by_prospect():
    """With lookahead on, histogram (state-limit) pruning must rank
    hypotheses by *anticipated* score (score + lookahead), like the
    reference (Search/WordConditionedTreeSearch.cc:1256-1264) — not by the
    raw acoustic score.

    Construction: two one-node words. At frame 1 word B has the better raw
    acoustic score (0 vs 5) but a much worse LM continuation (lookahead
    100 vs 0). With state_limit=1 the survivor must be word A (prospect
    5+0=5 beats 0+100=100); pruning on raw scores would keep B instead.
    """
    from speechrecognition_tpu.search.wcts import BIG, _wcts_scan

    big = BIG
    am = jnp.asarray(np.array([[[5.0, 0.0], [0.0, 0.0]]]))     # [B=1,T=2,S=2]
    feat_len = jnp.asarray(np.array([2], np.int32))
    state = jnp.asarray(np.array([0, 0, 1], np.int32))          # node→am state
    parent = jnp.asarray(np.array([0, 0, 0], np.int32))
    grand = jnp.asarray(np.array([0, 0, 0], np.int32))
    tdp = jnp.zeros((3, 3))
    loop_allowed = jnp.asarray(np.array([False, True, True]))
    entry_state = jnp.asarray(np.array([0, 0, 1], np.int32))
    entry_pen = jnp.asarray(np.array([big, 0.0, 0.0]))
    end_node = jnp.asarray(np.array([1, 2], np.int32))
    # lm_ext rows: contexts [A, B, start]; word A continuations cheap,
    # word B continuations expensive
    lm_ext = jnp.asarray(np.tile(np.array([0.0, 100.0]), (3, 1)))
    la = jnp.asarray(np.tile(np.array([0.0, 0.0, 100.0]), (3, 1)))

    _c, (books, _bkps, _preds, _off) = _wcts_scan(
        am, feat_len, state, parent, grand, tdp, loop_allowed,
        entry_state, entry_pen, end_node, lm_ext, la,
        jnp.asarray(200.0), prune=True, use_lookahead=True,
        state_limit=1, histogram_bins=101)
    books = np.asarray(books)
    # frame 1: word A's hypothesis survived (book finite), word B pruned
    assert books[0, 0, 0] < big * 0.5, books[0, 0]
    assert books[0, 0, 1] >= big * 0.5, books[0, 0]


def test_lookahead_pruning_preserves_transcripts(setup, lexicon, demo_corpus,
                                                 bigram_lm):
    pack, tdp, c = setup
    lm, lm_start = bigram_lm
    feats, lens = demo_corpus.padded_batch(list(range(35)))
    tables = TreeTables.build(lexicon, tdp, word_penalty=0.0)
    la = LookaheadTables.build(tables)
    base = decode_batch_wcts(pack, feats, lens, tables, tdp, lm, lm_start,
                             c["am_threshold"], lexicon.silence_idx,
                             dtype=jnp.float64)
    with_la = decode_batch_wcts(pack, feats, lens, tables, tdp, lm, lm_start,
                                c["am_threshold"], lexicon.silence_idx,
                                lookahead=la, dtype=jnp.float64)
    for b in range(35):
        assert with_la[b] == base[b], (b, with_la[b], base[b])


@pytest.mark.parametrize("transparent", [False, True])
def test_streaming_wcts_matches_offline(setup, lexicon, demo_corpus,
                                        bigram_lm, transparent):
    """OnlineWctsRecognizer (feed in odd-sized pieces, chunked carried
    tree-copy state) reproduces the offline decode_batch_wcts
    transcripts exactly — the reference's online mode runs this same
    decoder (SpeechRecognizer.cc:30-66)."""
    from speechrecognition_tpu.search.online import OnlineWctsRecognizer

    pack, tdp, c = setup
    lm, lm_start = bigram_lm
    if transparent:
        lm = lm.copy()
        lm[:, lexicon.silence_idx] = 0.0
    tables = TreeTables.build(lexicon, tdp, word_penalty=0.0)
    la = LookaheadTables.build(tables)

    n = 12
    feats, lens = demo_corpus.padded_batch(list(range(n)))
    offline = decode_batch_wcts(
        pack, feats, np.asarray(lens), tables, tdp, lm, lm_start,
        c["am_threshold"], lexicon.silence_idx, prune=True, lookahead=la,
        dtype=jnp.float64, transparent_silence=transparent)

    online = OnlineWctsRecognizer(
        pack, tables, tdp, lm, lm_start, c["am_threshold"],
        lexicon.silence_idx, lookahead=la, transparent_silence=transparent,
        dtype=jnp.float64, num_streams=n, chunk=64)
    T = feats.shape[1]
    for start in range(0, T, 45):       # odd feed sizes, partial mid-way
        online.feed(feats[:, start:start + 45])
        if start == 45:
            online.partial(lens)
    got = online.finish(lens)
    assert got == offline
    assert online.latency_stats if hasattr(online, "latency_stats") else True
