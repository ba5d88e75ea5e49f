"""AN4 system artifact regression (bench/an4/): the committed
self-trained acoustic model + the full assembly line keep decoding.

The full-corpus recorded numbers live in bench/an4/RESULTS.md
(tools/an4_system.py); this default-tier smoke decodes a slice with the
same tuned operating point and checks it stays in range."""

import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/src/example-setup/data"
AM = os.path.join(REPO, "bench", "an4", "am.mix")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(DATA) and os.path.exists(AM)),
    reason="AN4 data or committed model absent")


def test_an4_results_json_consistent():
    with open(os.path.join(REPO, "bench", "an4", "results.json")) as f:
        r = json.load(f)
    ops = r["operating_points"]
    assert r["corpus"]["segments"] == 130 and r["corpus"]["words"] == 773
    assert ops["tuned+lookahead"]["wer"] < 10.0
    assert ops["exact"]["wer"] < 20.0
    # lookahead recovers the exact result at this beam
    assert ops["pruned+lookahead"]["wer"] == ops["exact"]["wer"]
    assert ops["pruned+lookahead"]["mean_active_states"] \
        < ops["exact"]["mean_active_states"] / 100


@pytest.fixture(scope="module")
def an4_slice_decode():
    """8-utterance slice through the full assembly with the committed
    model; WCTS emits context lattices alongside the transcripts."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import an4_system as A
    from speechrecognition_tpu.io import read_mixture_set
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.search.wcts import (LookaheadTables,
                                                   decode_batch_wcts)
    from speechrecognition_tpu.tools.partition import subset_corpus

    (_cfg, corpus_xml, asm, lex, tm, net, ap_thr, _s) = A.build_system()
    corpus_full, word_seqs = A.load_corpus(corpus_xml, lex, net)
    model = MixtureModel.from_raw(
        read_mixture_set(AM, corpus_full.dim),
        VarianceModel.GLOBAL_POOLING, max_approx=True)
    lm, lm_start = A.build_lm_matrices(lex, tm, 6.0, 30.0, 10.0)

    n = 8
    idxs = list(range(n))
    corpus = subset_corpus(corpus_full, idxs)
    tables = tm.tree_tables(lex)
    la = LookaheadTables.build(tables)
    feats, lens = corpus.padded_batch(idxs)
    pack = model.pack(dtype=jnp.float32)
    # production decode: transparent silence (the tuned operating point)
    hyps = decode_batch_wcts(
        pack, feats, np.asarray(lens), tables, tm,
        lm, lm_start, ap_thr, lex.silence_idx, prune=True, lookahead=la,
        dtype=jnp.float32, transparent_silence=True)
    # lattice-emitting decode (context lattices for the Flf network)
    _hyps2, lats = decode_batch_wcts(
        pack, feats, np.asarray(lens), tables, tm,
        lm, lm_start, ap_thr, lex.silence_idx, prune=True, lookahead=la,
        dtype=jnp.float32, emit_lattice=True)
    names = [corpus_xml.segments[s].name for s in idxs]
    return lex, word_seqs, idxs, names, hyps, lats


def test_an4_system_smoke_slice(an4_slice_decode):
    from speechrecognition_tpu.search.edit_distance import edit_distance

    lex, word_seqs, idxs, _names, hyps, _lats = an4_slice_decode
    errors = total = 0
    for s in idxs:
        errors += edit_distance(word_seqs[s], hyps[s]).total_count
        total += len(word_seqs[s])
    wer = 100.0 * errors / total
    assert wer < 15.0, f"AN4 tuned smoke slice WER {wer:.1f}%"


def test_an4_flf_network_over_context_lattices(an4_slice_decode, tmp_path):
    """A 7-node Flf processor network over the AN4 context-lattice
    archive: reader → FB-builder → {local-cost-decoder,
    CN-builder → gamma → CN-decoder} → evaluator (the reference Flf
    tool's execution model on real search-derived lattices)."""
    import io

    from speechrecognition_tpu.search.flf import LatticeArchive
    from speechrecognition_tpu.search.flf_network import FlfNetwork
    from speechrecognition_tpu.sprint.config import SprintConfig

    lex, word_seqs, idxs, names, hyps, lats = an4_slice_decode
    vocab = [lex.orth[w] for w in range(lex.num_words)]
    arch_dir = tmp_path / "an4lats"
    arch = LatticeArchive(str(arch_dir), vocab)
    for name, clat in zip(names, lats):
        arch.write(name, clat.to_word_lattice())
    trans = tmp_path / "refs.txt"
    with open(trans, "w") as f:
        for name, s in zip(names, idxs):
            f.write(name + "\t"
                    + " ".join(vocab[w] for w in word_seqs[s]) + "\n")

    cfg = tmp_path / "net.config"
    cfg.write_text(f"""
[network]
initial-nodes = reader
[network.reader]
type = archive-reader
path = {arch_dir}
links = 0->fb:0
[network.fb]
type = FB-builder
links = 0->mbr:0 0->cn:0
[network.mbr]
type = local-cost-decoder
links = 0->sink:0
[network.cn]
type = center-frame-CN-builder
links = 0->gamma:0
[network.gamma]
type = CN-gamma-correction
gamma = 1.5
links = 0->eval:0
[network.eval]
type = evaluator
transcripts = {trans}
links = 0->sink:0
[network.sink]
type = sink
""")
    net = FlfNetwork.parse(SprintConfig.read(str(cfg)), vocab,
                           silence=lex.silence_idx)
    out = io.StringIO()
    results = net.run(names, out=out)
    # baseline: MAP errors on the PROJECTED word lattices (the context→
    # word projection over-generates paths, so the network is judged
    # against what the archive itself can achieve, not the 1-best)
    from speechrecognition_tpu.search.edit_distance import edit_distance
    map_errors = 0
    errors = total = 0
    for name, s in zip(names, idxs):
        wl = arch.read(name)
        mapw = [w for w in wl.best_path()[0] if w != wl.silence]
        map_errors += edit_distance(word_seqs[s], mapw).total_count
        e, r = results[name]["eval"]
        errors += e
        total += r
        assert isinstance(results[name]["mbr"], list)
    assert total > 0
    # CN decode over gamma-corrected posteriors must not lose to the
    # projected-lattice MAP by more than a word on this slice
    assert errors <= map_errors + 1, (errors, map_errors)
