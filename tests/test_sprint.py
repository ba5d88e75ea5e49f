"""Sprint-tier readers validated against the shipped AN4 example setup."""

import os

import numpy as np
import pytest

DATA = "/root/reference/src/example-setup/data"
CONFIG = "/root/reference/src/example-setup/config"

needs_an4 = pytest.mark.skipif(not os.path.isdir(DATA), reason="AN4 data absent")


@needs_an4
def test_file_archive_and_cache():
    from speechrecognition_tpu.sprint import FeatureCache
    cache = FeatureCache(f"{DATA}/mfcc.features.recognition.cache")
    assert len(cache.segments) == 130          # one per corpus segment
    key = cache.segments[0]
    attrs = cache.attributes(key)
    assert attrs.get("datatype") == "vector-f32"
    feats, times = cache.read_features(key)
    assert feats.ndim == 2 and feats.shape[0] > 50
    assert feats.shape[1] == 16                # Sprint MFCC base features
    assert np.isfinite(feats).all()
    # timestamps are contiguous 10ms frames
    assert times[1, 0] > times[0, 0]


@needs_an4
def test_bliss_corpus():
    from speechrecognition_tpu.sprint import BlissCorpus
    corpus = BlissCorpus.read(f"{DATA}/an4_test.20081021.corpus.gz")
    assert corpus.name == "AN4"
    assert len(corpus.segments) == 130
    seg = corpus.segments[0]
    assert seg.orth == ["RUBOUT", "G", "M", "E", "F", "THREE", "NINE"]
    assert corpus.full_segment_name(seg) == "AN4/an406-fcaw-b/an406-fcaw-b"


@needs_an4
def test_bliss_lexicon():
    from speechrecognition_tpu.sprint import BlissLexicon
    lex = BlissLexicon.read(f"{DATA}/an4.20081021.lexicon")
    assert lex.num_phonemes > 20
    assert lex.silence_lemma is not None
    assert lex.silence_lemma.orth[0] == "[SILENCE]"
    assert lex.silence_lemma.pronunciations == [["si"]]
    a = lex.lemma_of("A")
    assert a is not None and len(a.pronunciations) >= 1
    for pron in a.pronunciations:
        for ph in pron:
            assert ph in lex.phoneme_index


@needs_an4
def test_cart_tree():
    from speechrecognition_tpu.sprint import BlissLexicon, DecisionTree
    tree = DecisionTree.read(f"{DATA}/cart.1.tree")
    assert len(tree.questions) > 50
    n_leaves = tree.num_leaves()
    assert n_leaves > 100
    lex = BlissLexicon.read(f"{DATA}/an4.20081021.lexicon")
    # classify a handful of real triphone states — ids must be valid leaves
    for ph in lex.phonemes[:5]:
        for s in range(3):
            cls = tree.classify({"central": ph, "history[0]": "#",
                                 "future[0]": "#", "hmm-state": str(s),
                                 "boundary": "single-phoneme-lemma"})
            assert 0 <= cls <= tree.max_leaf_id()
    # different states of the same phone should usually tie differently
    ids = {tree.classify({"central": lex.phonemes[0], "history[0]": "#",
                          "future[0]": "#", "hmm-state": str(s),
                          "boundary": "within-lemma"}) for s in range(3)}
    assert len(ids) >= 2


@needs_an4
def test_lda_matrix_and_window():
    from speechrecognition_tpu.sprint import SlidingWindowLDA, read_matrix_xml
    mat = read_matrix_xml(f"{DATA}/lda-1.matrix")
    assert mat.shape == (45, 144)              # 45-dim out, 9×16 window
    lda = SlidingWindowLDA(mat, max_size=9, right=4)
    assert lda.input_dim == 16
    feats = np.random.default_rng(0).normal(0, 1, (50, 16)).astype(np.float32)
    out = lda(feats)
    assert out.shape == (50, 45)
    assert np.isfinite(out).all()


@needs_an4
def test_lda_on_real_cache_features():
    from speechrecognition_tpu.sprint import (FeatureCache, SlidingWindowLDA,
                                              read_matrix_xml)
    cache = FeatureCache(f"{DATA}/mfcc.features.recognition.cache")
    feats, _ = cache.read_features(cache.segments[0])
    lda = SlidingWindowLDA(read_matrix_xml(f"{DATA}/lda-1.matrix"),
                           max_size=9, right=4)
    out = lda(feats)
    assert out.shape == (feats.shape[0], 45)


@needs_an4
def test_sprint_config():
    from speechrecognition_tpu.sprint import SprintConfig
    cfg = SprintConfig.read(f"{CONFIG}/recognition-triphones-lda.config")
    assert cfg.get("recognizer.corpus.file") == "data/an4_test.20081021.corpus.gz"
    # wildcard TDP rules with specific override for silence
    assert cfg.get_float("x.acoustic-model.tdp.loop") == 3.0
    assert cfg.get_float("x.acoustic-model.tdp.silence.loop") == 0.0001
    assert cfg.get_float("x.acoustic-model.tdp.entry-m1.loop") == float("inf")
    assert cfg.get_int("y.acoustic-model.hmm.states-per-phone") == 3


# -- Core odds-and-ends (round-3): bundles, MD5, progress, rusage -------------

def test_file_archive_write_read_roundtrip(tmp_path):
    from speechrecognition_tpu.sprint.archive import (FileArchive,
                                                      write_file_archive)

    entries = {"a.feat": b"hello world", "dir/b.bin": bytes(range(256))}
    p = str(tmp_path / "t.archive")
    write_file_archive(p, entries)
    arch = FileArchive(p)
    assert set(arch.keys()) == set(entries)
    for k, v in entries.items():
        assert arch.read(k) == v
    pc = str(tmp_path / "c.archive")
    write_file_archive(pc, entries, compress=True)
    archc = FileArchive(pc)
    for k, v in entries.items():
        assert archc.read(k) == v


def test_bundle_archive(tmp_path):
    from speechrecognition_tpu.sprint.archive import write_file_archive
    from speechrecognition_tpu.sprint.core_utils import BundleArchive

    write_file_archive(str(tmp_path / "m1.archive"), {"x": b"one"})
    write_file_archive(str(tmp_path / "m2.archive"), {"y": b"two",
                                                      "x": b"shadowed"})
    bundle = tmp_path / "all.bundle"
    bundle.write_text("m1.archive\nm2.archive\n")
    b = BundleArchive(str(bundle))
    assert set(b.keys()) == {"x", "y"}
    assert b.read("x") == b"one"      # first member wins (bundle order)
    assert b.read("y") == b"two"
    # index round-trip
    b.write_index()
    b2 = BundleArchive(str(bundle))
    assert b2.read("y") == b"two"


def test_md5_and_rusage(tmp_path):
    import hashlib

    from speechrecognition_tpu.sprint.core_utils import (MD5,
                                                         resource_usage_info)

    m = MD5().update("abc").update(b"def")
    assert str(m) == hashlib.md5(b"abcdef").hexdigest()
    f = tmp_path / "blob"
    f.write_bytes(b"x" * 100000)
    assert str(MD5().update_from_file(str(f))) == \
        hashlib.md5(b"x" * 100000).hexdigest()

    info = resource_usage_info()
    assert info["user_s"] >= 0 and info["peak_rss_bytes"] > 0


def test_progress_indicator(capsys):
    import io

    from speechrecognition_tpu.sprint.core_utils import ProgressIndicator

    class Tty(io.StringIO):
        def isatty(self):
            return True

    out = Tty()
    p = ProgressIndicator("scan", out=out, min_interval=0.0)
    p.start(10)
    for _ in range(10):
        p.notify()
    elapsed = p.finish()
    assert elapsed >= 0
    assert "scan" in out.getvalue() and "10" in out.getvalue()
