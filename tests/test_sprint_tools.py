"""Sprint-style CLI tools: archiver, corpus/feature statistics,
lattice-processor."""

import io
import json
import os

import numpy as np
import pytest

from speechrecognition_tpu.search.flf import LatticeArchive
from speechrecognition_tpu.search.lattice import Arc, WordLattice
from speechrecognition_tpu.tools.sprint_tools import (archiver,
                                                      corpus_statistics,
                                                      feature_statistics,
                                                      lattice_processor, main)

DATA = "/root/reference/src/example-setup/data"
needs_an4 = pytest.mark.skipif(not os.path.isdir(DATA), reason="AN4 data absent")
VOCAB = ["[sil]", "eins", "zwei", "drei"]


@needs_an4
def test_archiver_list_and_extract(tmp_path):
    out = io.StringIO()
    rc = archiver([f"{DATA}/mfcc.features.recognition.cache", "list"], out=out)
    assert rc == 0
    keys = out.getvalue().splitlines()
    assert len(keys) > 100
    target = str(tmp_path / "blob.bin")
    rc = archiver([f"{DATA}/mfcc.features.recognition.cache", "extract",
                   keys[0], target])
    assert rc == 0
    assert os.path.getsize(target) > 0


@needs_an4
def test_corpus_statistics_bliss():
    out = io.StringIO()
    rc = corpus_statistics([f"{DATA}/an4_test.20081021.corpus.gz"], out=out)
    assert rc == 0
    stats = json.loads(out.getvalue())
    assert stats["segments"] == 130
    assert stats["words"] > 500


def test_corpus_statistics_json(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps([
        {"name": "a", "speaker": "sp1", "gender": "m", "orth": "eins zwei"},
        {"name": "b", "speaker": "sp2", "gender": "w", "orth": "drei"}]))
    out = io.StringIO()
    assert corpus_statistics([str(p)], out=out) == 0
    stats = json.loads(out.getvalue())
    assert stats == {"segments": 2, "words": 3, "speakers": 2,
                     "gender": {"m": 1, "w": 1}}


@needs_an4
def test_feature_statistics_cache():
    out = io.StringIO()
    rc = feature_statistics([f"{DATA}/mfcc.features.recognition.cache"],
                            out=out)
    assert rc == 0
    stats = json.loads(out.getvalue())
    assert stats["frames"] > 10000
    assert stats["dim"] == 16


def test_lattice_processor_ops(tmp_path):
    arch_dir = str(tmp_path / "arch")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    arch = LatticeArchive(arch_dir, VOCAB)
    lat = WordLattice(num_frames=10, arcs=[
        Arc(0, 4, 1, 1.0), Arc(4, 8, 2, 0.5), Arc(4, 8, 3, 4.0),
        Arc(8, 10, 0, 0.1)], silence=0)
    arch.write("utt1", lat)

    out = io.StringIO()
    assert lattice_processor([arch_dir, str(vocab_file), "best"], out=out) == 0
    line = out.getvalue().strip()
    assert line.split("\t")[0] == "utt1"
    assert line.split("\t")[2] == "eins zwei"

    out = io.StringIO()
    assert lattice_processor([arch_dir, str(vocab_file), "n-best", "2"],
                             out=out) == 0
    assert len(out.getvalue().splitlines()) == 2

    pruned_dir = str(tmp_path / "pruned")
    assert lattice_processor([arch_dir, str(vocab_file), "prune", "1.0",
                              pruned_dir]) == 0
    pruned = LatticeArchive(pruned_dir, VOCAB).read("utt1")
    assert len(pruned.arcs) == 3   # the weak 'drei' arc is gone

    out = io.StringIO()
    assert lattice_processor([arch_dir, str(vocab_file), "cn-decode"],
                             out=out) == 0
    assert out.getvalue().strip().split("\t")[1] == "eins zwei"


def test_main_dispatch():
    assert main([]) == 1
    assert main(["no-such-tool"]) == 1
