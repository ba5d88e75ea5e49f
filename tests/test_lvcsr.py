"""LVCSR tier integration: AN4 lexicon + CART + LDA + cache → decoder tables,
and a self-contained train+decode smoke test on the cache features.

The reference example-setup ships everything except the trained acoustic
model, so full WER parity is impossible; instead we verify the whole
assembly line produces consistent structures and that a quickly-trained
model on the (test) cache features can decode its own training data far
better than chance — exercising corpus→features→LDA→tied-states→EM→decode
end to end.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

DATA = "/root/reference/src/example-setup/data"
needs_an4 = pytest.mark.skipif(not os.path.isdir(DATA), reason="AN4 data absent")


@pytest.fixture(scope="module")
def an4():
    from speechrecognition_tpu.sprint import (BlissCorpus, BlissLexicon,
                                              DecisionTree, FeatureCache,
                                              SlidingWindowLDA, read_matrix_xml)
    from speechrecognition_tpu.sprint.am import AllophoneStateModel

    bliss = BlissLexicon.read(f"{DATA}/an4.20081021.lexicon")
    tree = DecisionTree.read(f"{DATA}/cart.1.tree")
    corpus = BlissCorpus.read(f"{DATA}/an4_test.20081021.corpus.gz")
    cache = FeatureCache(f"{DATA}/mfcc.features.recognition.cache")
    lda = SlidingWindowLDA(read_matrix_xml(f"{DATA}/lda-1.matrix"),
                           max_size=9, right=4)
    asm = AllophoneStateModel(bliss=bliss, tree=tree)
    return bliss, tree, corpus, cache, lda, asm


@needs_an4
def test_tied_state_automata(an4):
    bliss, tree, corpus, cache, lda, asm = an4
    lex, orths, tied = asm.build_search_lexicon()
    assert lex.silence_idx == 0
    assert lex.num_words > 100            # 103 lemmas + variants
    # every slot maps to a valid CART class
    assert tied.min() >= 0 and tied.max() <= tree.max_leaf_id()
    # silence is 1 phone × 3 states
    assert lex.get_silence_automaton().num_states == 3
    # a 1-phoneme word ("A") has 3 positions, longer words more
    a = lex.get_automaton_for_word(lex.word_idx("A"))
    assert a.num_states == 3


@needs_an4
def test_transition_model_from_config(an4):
    from speechrecognition_tpu.sprint import SprintConfig
    from speechrecognition_tpu.sprint.am import TransitionModel
    cfg = SprintConfig.read(
        "/root/reference/src/example-setup/config/recognition-triphones-lda.config")
    tm = TransitionModel.from_config(cfg)
    assert tm.default.loop == 3.0
    assert tm.default.exit == 150.0
    assert tm.silence.loop == 0.0001
    assert tm.silence.exit == 15.0
    assert tm.entry_m1.loop == float("inf")


@needs_an4
@pytest.mark.slow  # ~90s: full AN4 train+decode loop (covered at smaller
# scale by the arpa-bigram decode test in the default tier)
def test_an4_train_decode_smoke(an4):
    """Train a tiny tied-state GMM on 40 cache utterances (forced-aligned
    from linear segmentation + realign) and decode them — the in-domain
    WER must beat 50% (chance on 103 words is ≈100%)."""
    from speechrecognition_tpu.corpus import Corpus
    from speechrecognition_tpu.lexicon import build_segment_automaton
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.search.decoder import DecoderTables, decode_batch
    from speechrecognition_tpu.search.edit_distance import edit_distance
    from speechrecognition_tpu.tdp import TdpModel
    from speechrecognition_tpu.train.em import Trainer, TrainerConfig

    bliss, tree, corpus_xml, cache, lda, asm = an4
    lex, orths, _tied = asm.build_search_lexicon()

    n_utts = 130
    segs = corpus_xml.segments[:n_utts]
    feats_list = []
    offsets = [0]
    word_seqs = []
    for seg in segs:
        key = corpus_xml.full_segment_name(seg)
        f, _t = cache.read_features(key)
        feats_list.append(lda(f).astype(np.float32))
        offsets.append(offsets[-1] + f.shape[0])
        word_seqs.append([lex.word_idx(w) for w in seg.orth])

    corpus = Corpus(
        features=np.concatenate(feats_list, axis=0),
        feature_offsets=np.asarray(offsets, dtype=np.int64),
        orths=word_seqs, names=[s.name for s in segs],
        frame_duration=0.01, dim=45)

    num_classes = asm.num_classes
    model = MixtureModel(dim=45, num_mixtures=num_classes,
                         var_model=VarianceModel.GLOBAL_POOLING, max_approx=True)
    tdp = TdpModel(silence_state=int(lex.get_silence_automaton().states[0]),
                   loop=3.0, forward=0.0, skip=30.0)
    cfg = TrainerConfig(min_obs=1, num_splits=2, num_aligns=2, num_estimates=3,
                        pruning_threshold=300.0)
    trainer = Trainer(cfg, lex, model, tdp, dtype=jnp.float64,
                      log=lambda *a: None)
    trainer.train(corpus)

    # word penalty plays the role of Sprint's high exit penalty (the
    # shipped config uses *.exit = 150 for words, 15 for silence)
    tables = DecoderTables.build(lex, tdp, word_penalty=40.0)
    feats, lens = corpus.padded_batch(list(range(n_utts)))
    hyps = decode_batch(model.pack(dtype=jnp.float64), feats, lens, tables,
                        500.0, lex.silence_idx, dtype=jnp.float64)
    errors = total = 0
    for s in range(n_utts):
        ed = edit_distance(word_seqs[s], hyps[s])
        errors += ed.total_count
        total += len(word_seqs[s])
    wer = 100.0 * errors / total
    assert wer < 40.0, f"in-domain AN4 WER {wer:.1f}%"


@pytest.fixture(scope="module")
def an4_arpa_setup(an4):
    """Shared LVCSR assembly: features → tied-state GMM (self-trained) →
    ARPA bigram matrices over the search lexicon."""
    from speechrecognition_tpu.corpus import Corpus
    from speechrecognition_tpu.lm.arpa import ArpaLM
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.tdp import TdpModel
    from speechrecognition_tpu.train.em import Trainer, TrainerConfig

    bliss, tree, corpus_xml, cache, lda, asm = an4
    lex, orths, _tied = asm.build_search_lexicon()

    feats_list, offsets, word_seqs = [], [0], []
    for seg in corpus_xml.segments:
        f, _t = cache.read_features(corpus_xml.full_segment_name(seg))
        feats_list.append(lda(f).astype(np.float32))
        offsets.append(offsets[-1] + f.shape[0])
        word_seqs.append([lex.word_idx(w) for w in seg.orth])
    corpus = Corpus(features=np.concatenate(feats_list),
                    feature_offsets=np.asarray(offsets, np.int64),
                    orths=word_seqs, names=[s.name for s in corpus_xml.segments],
                    frame_duration=0.01, dim=45)

    model = MixtureModel(dim=45, num_mixtures=asm.num_classes,
                         var_model=VarianceModel.GLOBAL_POOLING, max_approx=True)
    tdp = TdpModel(silence_state=int(lex.get_silence_automaton().states[0]),
                   loop=3.0, forward=0.0, skip=30.0)
    trainer = Trainer(TrainerConfig(min_obs=1, num_splits=2, num_aligns=2,
                                    num_estimates=3, pruning_threshold=300.0),
                      lex, model, tdp, dtype=jnp.float64, log=lambda *a: None)
    trainer.train(corpus)
    pack = model.pack(dtype=jnp.float64)

    # ARPA bigram → dense -log p matrix over the search lexicon
    arpa = ArpaLM(f"{DATA}/an4.2.20081121.lm")
    W = lex.num_words
    sil = lex.silence_idx
    scale = 12.0
    lm_ids = [arpa.index(lex.orth[w]) if lex.orth[w] in arpa.word2int
              else arpa.index("<unk>") if "<unk>" in arpa.word2int else None
              for w in range(W)]
    bos = arpa.index("<s>")
    lm = np.zeros((W, W))
    lm_start = np.zeros(W)
    for w in range(W):
        if w == sil:
            continue
        lm_start[w] = scale * arpa.score(lm_ids[w], [bos]) + 10.0
        for v in range(W):
            ctx = [lm_ids[v]] if v != sil else [bos]
            lm[v, w] = scale * arpa.score(lm_ids[w], ctx) + 10.0
    lm[:, sil] = 0.0
    lm_start[sil] = 0.0
    return lex, tdp, pack, corpus, word_seqs, lm, lm_start


def _wer(word_seqs, hyps, idxs):
    from speechrecognition_tpu.search.edit_distance import edit_distance
    errors = total = 0
    for s in idxs:
        ed = edit_distance(word_seqs[s], hyps[s - idxs[0]])
        errors += ed.total_count
        total += len(word_seqs[s])
    return 100.0 * errors / total


@needs_an4
def test_an4_arpa_bigram_decode(an4_arpa_setup):
    """Full LVCSR stack: Bliss lexicon + CART tying + LDA features + ARPA
    bigram LM + word-conditioned decoder. The LM must not hurt (and
    usually helps) vs the plain word-penalty decode."""
    from speechrecognition_tpu.search.decoder import DecoderTables
    from speechrecognition_tpu.search.ngram_decoder import decode_batch_bigram

    lex, tdp, pack, corpus, word_seqs, lm, lm_start = an4_arpa_setup
    tables0 = DecoderTables.build(lex, tdp, word_penalty=0.0)
    feats, lens = corpus.padded_batch(list(range(130)))
    hyps = decode_batch_bigram(pack, feats, lens, tables0, lm, lm_start,
                               500.0, lex.silence_idx, dtype=jnp.float64)
    wer = _wer(word_seqs, hyps, list(range(130)))
    assert wer < 40.0, f"AN4 ARPA-bigram WER {wer:.1f}%"


@needs_an4
@pytest.mark.slow  # ~240s: the WCTS+lookahead AN4 decode; the default tier
# keeps the bigram AN4 decode and the demo-corpus WCTS equivalence tests
def test_an4_wcts_lookahead_decode(an4_arpa_setup):
    """Word-conditioned tree search with compressed LM lookahead on the
    real AN4 prefix tree (shared triphone-state prefixes across 100+
    words). Must perform on par with the linear bigram search — the tree
    additionally allows continuation through word-end nodes, so exact
    transcript equality is not guaranteed, but WER must not degrade."""
    from speechrecognition_tpu.search.decoder import DecoderTables
    from speechrecognition_tpu.search.ngram_decoder import decode_batch_bigram
    from speechrecognition_tpu.search.tree_decoder import TreeTables
    from speechrecognition_tpu.search.wcts import (LookaheadTables,
                                                   decode_batch_wcts)

    lex, tdp, pack, corpus, word_seqs, lm, lm_start = an4_arpa_setup
    tree_tables = TreeTables.build(lex, tdp, word_penalty=0.0)
    # real prefix sharing: fewer nodes than the sum of automaton lengths
    total_states = sum(lex.get_automaton_for_word(w).num_states
                      for w in range(lex.num_words))
    assert tree_tables.num_nodes < total_states + 1

    la = LookaheadTables.build(tree_tables)
    assert 1 < la.num_tables <= tree_tables.num_nodes

    n = 32
    idxs = list(range(n))
    feats, lens = corpus.padded_batch(idxs)
    hyps_tree = decode_batch_wcts(pack, feats, lens, tree_tables, tdp,
                                  lm, lm_start, 500.0, lex.silence_idx,
                                  lookahead=la, dtype=jnp.float64)
    lin_tables = DecoderTables.build(lex, tdp, word_penalty=0.0)
    hyps_lin = decode_batch_bigram(pack, feats, lens, lin_tables, lm,
                                   lm_start, 500.0, lex.silence_idx,
                                   dtype=jnp.float64)
    wer_tree = _wer(word_seqs, hyps_tree, idxs)
    wer_lin = _wer(word_seqs, hyps_lin, idxs)
    assert wer_tree <= wer_lin + 2.0, (wer_tree, wer_lin)


def _sprint_brute_force(lex, tm, am, T, state_repetitions=1):
    """Reference-semantics path enumerator: Sprint source-state TDP
    charging per repetition sub-state (phone0/phone1/silence), entry-m1
    entries, exit TDP of the word's last state at word end."""
    BIG = 1e30
    W = lex.num_words
    state_table = lex.state_table()
    word_len = lex.word_lengths()
    P = lex.max_positions

    def tdp_of(w, slot):
        return tm._slot_tdp(w == lex.silence_idx, slot, state_repetitions)

    hyp = np.full((W, P), BIG)
    bkp = np.zeros((W, P), np.int64)
    book = 0.0
    frame_word, frame_bkp = [], []
    for t in range(T):
        new = np.full((W, P), BIG)
        nbk = np.zeros((W, P), np.int64)
        for w in range(W):
            for p in range(int(word_len[w])):
                cands = []
                for sp, kind in ((p, "loop"), (p - 1, "forward"),
                                 (p - 2, "skip")):
                    if sp < 0 or hyp[w, sp] >= BIG / 2:
                        continue
                    pen = getattr(tdp_of(w, sp), kind)
                    if np.isfinite(pen):
                        cands.append((hyp[w, sp] + pen, bkp[w, sp]))
                if p == 0 and np.isfinite(tm.entry_m1.forward):
                    cands.append((book + tm.entry_m1.forward, t))
                if p == 1 and np.isfinite(tm.entry_m1.skip):
                    cands.append((book + tm.entry_m1.skip, t))
                if cands:
                    sc, bk = min(cands, key=lambda c: c[0])
                    new[w, p] = sc + am[0, t, state_table[w, p]]
                    nbk[w, p] = bk
        hyp, bkp = new, nbk
        ends = [hyp[w, int(word_len[w]) - 1]
                + tdp_of(w, int(word_len[w]) - 1).exit for w in range(W)]
        bw = int(np.argmin(ends))
        book = ends[bw]
        frame_word.append(bw)
        frame_bkp.append(int(bkp[bw, int(word_len[bw]) - 1]))

    want, t = [], T
    while t > 0:
        w = frame_word[t - 1]
        if w != lex.silence_idx:
            want.append(w)
        t = frame_bkp[t - 1]
    want.reverse()
    return want


def _sprint_test_setup(state_repetitions=1):
    from speechrecognition_tpu.lexicon import Lexicon
    from speechrecognition_tpu.sprint.am import StateTypeTdp, TransitionModel

    lex = Lexicon()
    r = state_repetitions
    lex.add_word("[silence]", 1, r, silence=True)
    lex.add_word("a", 3, r)
    lex.add_word("b", 2, r)

    tm = TransitionModel(
        default=StateTypeTdp(loop=3.0, forward=0.0, skip=12.0, exit=9.0),
        silence=StateTypeTdp(loop=1.5, forward=0.0, skip=float("inf"),
                             exit=2.0),
        entry_m1=StateTypeTdp(loop=float("inf"), forward=1.0, skip=7.0),
        entry_m2=StateTypeTdp(),
        phone1=StateTypeTdp(loop=4.5, forward=0.5, skip=11.0, exit=8.0)
        if r > 1 else None)
    return lex, tm


@pytest.mark.parametrize("reps", [1, 2])
def test_sprint_transition_decoder_tables_brute_force(reps):
    """tm.decoder_tables decode == brute-force Viterbi with Sprint
    source-state TDP charging (incl. phone1 on odd sub-states),
    entry-m1 entries and exit-at-word-end."""
    from speechrecognition_tpu.search.decoder import decode_batch

    lex, tm = _sprint_test_setup(reps)
    tables = tm.decoder_tables(lex, state_repetitions=reps)
    rng = np.random.default_rng(7)
    T = 14
    am = rng.uniform(0.0, 10.0, size=(1, T, lex.num_states))
    want = _sprint_brute_force(lex, tm, am, T, state_repetitions=reps)

    hyps = decode_batch(None, np.zeros((1, T, 1), np.float32),
                        np.asarray([T]), tables, 1e9, lex.silence_idx,
                        prune=False, dtype=jnp.float64,
                        am=jnp.asarray(am))
    assert hyps[0] == want, (reps, hyps[0], want)


@pytest.mark.parametrize("reps", [1, 2])
def test_sprint_transition_tree_tables_brute_force(reps):
    """tm.tree_tables through the prefix-tree decoder reproduces the same
    reference-semantics brute force (entry-m1, per-sub-state TDPs, exit
    at word-end nodes)."""
    from speechrecognition_tpu.search.tree_decoder import decode_batch_tree

    lex, tm = _sprint_test_setup(reps)
    tables = tm.tree_tables(lex, state_repetitions=reps)
    rng = np.random.default_rng(13)
    T = 17
    am = rng.uniform(0.0, 10.0, size=(1, T, lex.num_states))
    want = _sprint_brute_force(lex, tm, am, T, state_repetitions=reps)

    hyps = decode_batch_tree(None, np.zeros((1, T, 1), np.float32),
                             np.asarray([T]), tables, 1e9, lex.silence_idx,
                             prune=False, dtype=jnp.float64,
                             am=jnp.asarray(am))
    assert hyps[0] == want, (reps, hyps[0], want)


def test_mc_scaled_model_combination():
    """Mc scale propagation: effective = parent × own, ScaleUpdate
    overrides, and ModelCombination resolving from a Sprint config."""
    import io
    from speechrecognition_tpu.sprint.config import SprintConfig
    from speechrecognition_tpu.sprint.mc import (ModelCombination,
                                                 ScaledComponent)

    root = ScaledComponent(2.0)
    am = root.add_child("acoustic-model", ScaledComponent(3.0))
    tdp = am.add_child("tdp", ScaledComponent(0.5))
    assert am.scale == 6.0
    assert tdp.scale == 3.0
    root.set_own_scale(1.0)
    assert am.scale == 3.0 and tdp.scale == 1.5
    root.distribute_scale_update({"acoustic-model.tdp": 2.0})
    assert tdp.own_scale == 2.0 and tdp.scale == 6.0

    import tempfile, os
    cfg_text = """
[x]
scale = 1.0
pronunciation-scale = 2.0
[x.acoustic-model]
scale = 4.0
[x.lm]
scale = 11.0
"""
    with tempfile.NamedTemporaryFile("w", suffix=".config",
                                     delete=False) as f:
        f.write(cfg_text)
        path = f.name
    try:
        mc = ModelCombination.from_config(SprintConfig.read(path))
    finally:
        os.unlink(path)
    assert mc.am_scale == 4.0
    assert mc.lm_scale == 11.0
    assert mc.pronunciation_scale == 2.0
    assert mc.tdp_scale == 4.0  # inherits the acoustic-model scale
    lm = np.ones((3, 3))
    assert np.allclose(mc.lm_matrix(lm), 11.0)
