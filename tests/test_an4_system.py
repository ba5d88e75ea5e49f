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


def test_an4_system_smoke_slice():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import an4_system as A
    from speechrecognition_tpu.io import read_mixture_set
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.search.edit_distance import edit_distance
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
    hyps = decode_batch_wcts(
        model.pack(dtype=jnp.float32), feats, np.asarray(lens), tables, tm,
        lm, lm_start, ap_thr, lex.silence_idx, prune=True, lookahead=la,
        dtype=jnp.float32, transparent_silence=True)
    errors = total = 0
    for s in idxs:
        errors += edit_distance(word_seqs[s], hyps[s]).total_count
        total += len(word_seqs[s])
    wer = 100.0 * errors / total
    assert wer < 15.0, f"AN4 tuned smoke slice WER {wer:.1f}%"
