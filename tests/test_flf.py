"""Flf tier tests: SLF round-trip, lattice archives, confusion networks,
system combination — plus an end-to-end CN consensus check on real demo
lattices from the decoder."""

import math

import numpy as np
import pytest

from speechrecognition_tpu.search.flf import (CnSlot, LatticeArchive,
                                              cn_decode,
                                              combine_confusion_networks,
                                              confusion_network, read_slf,
                                              write_slf)
from speechrecognition_tpu.search.lattice import Arc, WordLattice

VOCAB = ["[sil]", "eins", "zwei", "drei", "vier"]


def toy_lattice():
    # two competing words in the middle, shared endpoints
    arcs = [Arc(0, 4, 1, 1.0),
            Arc(4, 8, 2, 0.5), Arc(4, 8, 3, 0.9),
            Arc(8, 10, 4, 0.2)]
    return WordLattice(num_frames=10, arcs=arcs, silence=0)


def test_slf_roundtrip(tmp_path):
    lat = toy_lattice()
    path = str(tmp_path / "l.slf")
    write_slf(path, lat, VOCAB, utterance="utt1")
    back = read_slf(path, VOCAB)
    assert back.num_frames == lat.num_frames
    assert len(back.arcs) == len(lat.arcs)
    orig = {(a.start, a.end, a.word): a.score for a in lat.arcs}
    for a in back.arcs:
        assert (a.start, a.end, a.word) in orig
        assert a.score == pytest.approx(orig[(a.start, a.end, a.word)],
                                        abs=1e-5)
    # best path must survive the round trip
    w0, s0 = lat.best_path()
    w1, s1 = back.best_path()
    assert w0 == w1 and s0 == pytest.approx(s1, abs=1e-4)


def test_slf_gzip(tmp_path):
    lat = toy_lattice()
    path = str(tmp_path / "l.slf.gz")
    write_slf(path, lat, VOCAB)
    back = read_slf(path, VOCAB)
    assert len(back.arcs) == len(lat.arcs)


def test_lattice_archive(tmp_path):
    arch = LatticeArchive(str(tmp_path / "arch"), VOCAB)
    lat = toy_lattice()
    arch.write("corpus/rec1/utt1", lat)
    arch.write("corpus/rec1/utt2", lat)
    assert arch.list() == ["corpus/rec1/utt1", "corpus/rec1/utt2"]
    back = arch.read("corpus/rec1/utt1")
    assert back.best_path()[0] == lat.best_path()[0]


def test_confusion_network_posteriors():
    lat = toy_lattice()
    slots = confusion_network(lat)
    # three slots: {eins}, {zwei vs drei}, {vier}
    assert len(slots) == 3
    mid = slots[1]
    assert set(mid.probs) == {2, 3}
    # posterior ratio must follow the score difference
    expect = math.exp(-0.5) / (math.exp(-0.5) + math.exp(-0.9))
    assert mid.probs[2] == pytest.approx(expect, abs=1e-6)
    assert sum(mid.probs.values()) == pytest.approx(1.0, abs=1e-6)
    assert cn_decode(slots) == [1, 2, 4]


def test_cn_epsilon_slot():
    # an optional word: path with and without it
    arcs = [Arc(0, 4, 1, 0.1),
            Arc(4, 8, 2, 1.2),          # optional word (weak)
            Arc(4, 8, 0, 0.1),          # silence alternative (strong)
            Arc(8, 10, 3, 0.1)]
    lat = WordLattice(num_frames=10, arcs=arcs, silence=0)
    slots = confusion_network(lat)
    mid = [s for s in slots if 2 in s.probs][0]
    assert mid.eps_prob() > mid.probs[2]
    assert cn_decode(slots) == [1, 3]


def test_system_combination_majority_vote():
    def cn(words):
        slots = []
        for k, (w, p) in enumerate(words):
            s = CnSlot(start=4 * k, end=4 * k + 4)
            s.probs[w] = p
            slots.append(s)
        return slots

    sys1 = cn([(1, 0.9), (2, 0.6), (4, 0.8)])
    sys2 = cn([(1, 0.8), (3, 0.7), (4, 0.9)])
    sys3 = cn([(1, 0.7), (3, 0.8), (4, 0.6)])
    comb = combine_confusion_networks([sys1, sys2, sys3])
    assert cn_decode(comb) == [1, 3, 4]   # 2-of-3 majority on slot 2


def test_cn_consensus_on_demo_lattice(lexicon, fixtures_dir, demo_corpus,
                                      demo_recognition):
    """End-to-end: decoder books → lattice → CN consensus must be at
    least as good as the lattice best path on the demo corpus."""
    import jax.numpy as jnp
    from speechrecognition_tpu.io import read_mixture_set
    from speechrecognition_tpu.models import gmm as gmm_mod
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.search.decoder import DecoderTables
    from speechrecognition_tpu.search.edit_distance import edit_distance
    from speechrecognition_tpu.search.ngram_decoder import _decode_scan_bigram
    from speechrecognition_tpu.tdp import TdpModel

    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=0, loop=c["tdp"][0], forward=c["tdp"][1],
                   skip=c["tdp"][2])
    tables = DecoderTables.build(lexicon, tdp, word_penalty=0.0)
    pack = model.pack(dtype=jnp.float64)
    W = lexicon.num_words
    lm = np.full((W, W), c["word_penalty"])
    lm[:, lexicon.silence_idx] = 0.0
    lm_start = lm[0].copy()

    n = 10
    feats, lens = demo_corpus.padded_batch(list(range(n)))
    B, T, dim = feats.shape
    am = gmm_mod.am_scores(pack, jnp.asarray(feats.reshape(B * T, dim)))
    am = am.reshape(B, T, pack.num_mixtures)
    scores, bkps, preds, offsets = _decode_scan_bigram(
        am, jnp.asarray(lens, jnp.int32),
        jnp.asarray(tables.state_table), jnp.asarray(tables.last_pos),
        jnp.asarray(tables.word_len), jnp.asarray(tables.first_state),
        jnp.asarray(tables.tdp_within), jnp.asarray(tables.entry_pen),
        jnp.asarray(lm), jnp.asarray(lm_start),
        jnp.asarray(c["am_threshold"], jnp.float64))
    scores, bkps, offsets = map(np.asarray, (scores, bkps, offsets))

    err_best = err_cn = total = 0
    for b in range(n):
        lat = WordLattice.from_books(scores[:, b], bkps[:, b], offsets[:, b],
                                     int(lens[b]), silence=0)
        ref = demo_corpus.orths[b]
        hyp_best = [w for w in lat.best_path()[0] if w != 0]
        hyp_cn = [w for w in cn_decode(confusion_network(lat)) if w != 0]
        err_best += edit_distance(ref, hyp_best).total_count
        err_cn += edit_distance(ref, hyp_cn).total_count
        total += len(ref)
    assert err_cn <= err_best + max(2, int(0.02 * total)), (err_cn, err_best)


def test_push_lattice_preserves_path_scores():
    from speechrecognition_tpu.search.flf import push_lattice

    lat = toy_lattice()
    pushed = push_lattice(lat)
    assert len(pushed.arcs) == len(lat.arcs)
    w0, s0 = lat.best_path()
    w1, s1 = pushed.best_path()
    assert w1 == w0
    assert s1 == pytest.approx(s0, abs=1e-9)
    # pushing moves weight forward: the first arc absorbs downstream mass
    first = min(pushed.arcs, key=lambda a: a.start)
    assert first.score == pytest.approx(s0, abs=1e-9)


def test_compose_linear_transcript():
    from speechrecognition_tpu.search.flf import compose_linear

    lat = toy_lattice()
    # transcript through word 3 (the worse middle arc)
    score, path = compose_linear(lat, [1, 3, 4])
    assert score == pytest.approx(1.0 + 0.9 + 0.2, abs=1e-9)
    assert [p[2] for p in path] == [1, 3, 4]
    # transcript not in the lattice
    score, path = compose_linear(lat, [1, 1, 4])
    assert math.isinf(score) and path == []
    # silence arcs pass freely
    arcs = lat.arcs + [Arc(8, 9, 0, 0.05), Arc(9, 10, 4, 0.1)]
    lat2 = WordLattice(num_frames=10, arcs=arcs, silence=0)
    score2, path2 = compose_linear(lat2, [1, 2, 4])
    assert score2 == pytest.approx(1.0 + 0.5 + 0.05 + 0.1, abs=1e-9)
    assert [p[2] for p in path2] == [1, 2, 0, 4]


def test_context_lattice_archive(tmp_path):
    from speechrecognition_tpu.search.context_lattice import (CArc,
                                                              ContextLattice)

    arcs = [CArc(start=0, pred=5, end=4, word=1, am=1.0, lm=0.2),
            CArc(start=4, pred=1, end=8, word=2, am=0.5, lm=0.1),
            CArc(start=4, pred=1, end=8, word=3, am=0.4, lm=0.9)]
    lat = ContextLattice(num_frames=8, num_contexts=6, arcs=arcs, silence=0)
    arch = LatticeArchive(str(tmp_path / "ctx"), VOCAB, context=True)
    arch.write("utt/1", lat)
    back = arch.read("utt/1")
    assert back.num_frames == 8 and back.num_contexts == 6
    assert back.best_words() == lat.best_words()
    assert sorted((a.start, a.pred, a.end, a.word) for a in back.arcs) == \
        sorted((a.start, a.pred, a.end, a.word) for a in arcs)


# -- lattice-level structural ops (round-3 Flf breadth) -----------------------

def test_union_merges_paths():
    from speechrecognition_tpu.search.flf import union_lattices

    a = toy_lattice()
    b = WordLattice(num_frames=10,
                    arcs=[Arc(0, 4, 1, 0.8), Arc(4, 10, 4, 0.3)], silence=0)
    u = union_lattices([a, b])
    # every input path exists in the union
    for lat in (a, b):
        w, _ = lat.best_path()
        assert any(True for _ in [0])  # structural check below
    keys = {(x.start, x.end, x.word) for x in u.arcs}
    assert {(x.start, x.end, x.word) for x in a.arcs} <= keys
    assert {(x.start, x.end, x.word) for x in b.arcs} <= keys
    # the duplicate (0,4,word 1) arc merged by log-add: mass increases
    merged = next(x for x in u.arcs if (x.start, x.end, x.word) == (0, 4, 1))
    assert merged.score < min(0.8, 1.0)
    # union best path is at least as good as each input's
    wu, su = u.best_path()
    for lat in (a, b):
        _, s = lat.best_path()
        assert su <= s + 1e-9


def test_trim_and_mesh_drop_dead_arcs():
    from speechrecognition_tpu.search.flf import mesh_lattice, trim_lattice

    arcs = [Arc(0, 4, 1, 1.0), Arc(4, 10, 2, 0.5),
            Arc(5, 7, 3, 0.1)]       # dangling: nothing reaches frame 5
    lat = WordLattice(num_frames=10, arcs=arcs, silence=0)
    t = trim_lattice(lat)
    assert {(a.start, a.end) for a in t.arcs} == {(0, 4), (4, 10)}
    m = mesh_lattice(lat)
    assert {(a.start, a.end) for a in m.arcs} == {(0, 4), (4, 10)}


def test_determinize_minimize_lattice():
    from speechrecognition_tpu.search.flf import (determinize_lattice,
                                                  minimize_lattice)

    lat = toy_lattice()
    det = determinize_lattice(lat)
    # deterministic: no state has two out-arcs with one label
    outs = {}
    for i in range(det.num_arcs):
        key = (int(det.src[i]), int(det.ilabel[i]))
        assert key not in outs, "nondeterministic arc"
        outs[key] = i
    # best path is preserved exactly
    from speechrecognition_tpu.fsa.ops import best_path as fsa_best
    labels, _states, score = fsa_best(det)
    words, want = lat.best_path()
    assert labels == words
    assert score == pytest.approx(want, abs=1e-9)
    mini = minimize_lattice(lat)
    assert mini.num_states <= det.num_states
    labels2, _s2, score2 = fsa_best(mini)
    assert labels2 == words
    assert score2 == pytest.approx(want, abs=1e-9)


def test_pivot_confusion_network():
    from speechrecognition_tpu.search.flf import pivot_confusion_network

    slots = pivot_confusion_network(toy_lattice(), silence_as_eps=False)
    # skeleton = the 3-arc best path; competitor word 3 joins slot 2
    assert len(slots) == 3
    assert set(slots[1].probs) == {2, 3}
    assert slots[1].probs[2] > slots[1].probs[3]
    assert cn_decode(slots) == [1, 2, 4]


def test_rescore_arpa_matches_brute_force(tmp_path):
    from speechrecognition_tpu.lm.arpa import ArpaLM
    from speechrecognition_tpu.search.context_lattice import (CArc,
                                                              ContextLattice)
    from speechrecognition_tpu.search.flf import rescore_arpa

    vocab = VOCAB
    # trigram ARPA over the toy vocabulary
    arpa = tmp_path / "toy.arpa"
    arpa.write_text("""
\\data\\
ngram 1=7
ngram 2=2
ngram 3=1

\\1-grams:
-0.8\t<s>\t-0.3
-0.9\t</s>
-0.7\teins\t-0.2
-0.8\tzwei\t-0.2
-0.9\tdrei\t-0.1
-1.0\tvier\t-0.1
-2.0\t<unk>

\\2-grams:
-0.3\teins zwei\t-0.1
-0.4\t<s> eins\t-0.1

\\3-grams:
-0.2\teins zwei vier

\\end\\
""")
    lm = ArpaLM(str(arpa))
    W = len(vocab)
    arcs = [CArc(0, W, 4, 1, am=10.0, lm=0.0),
            CArc(4, 1, 8, 2, am=9.0, lm=0.0),
            CArc(4, 1, 8, 3, am=8.5, lm=0.0),
            CArc(8, 2, 10, 4, am=3.0, lm=0.0),
            CArc(8, 3, 10, 4, am=3.0, lm=0.0)]
    clat = ContextLattice(num_frames=10, num_contexts=W + 1, arcs=arcs,
                          silence=0)
    scale = 5.0
    words, score = rescore_arpa(clat, lm, vocab, scale=scale)

    def path_cost(seq):
        am = {(1, 2, 4): 10.0 + 9.0 + 3.0, (1, 3, 4): 10.0 + 8.5 + 3.0}[seq]
        toks = [vocab[w] for w in seq]
        return am + scale * lm.sentence_score(toks)

    want = min(path_cost((1, 2, 4)), path_cost((1, 3, 4)))
    assert score == pytest.approx(want, abs=1e-9)
    assert list(words) == [1, 2, 4] if want == path_cost((1, 2, 4)) \
        else [1, 3, 4]
