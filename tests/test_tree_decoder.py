"""Prefix-tree decoder: must reproduce the word-loop decoder on SieTill
(no shared prefixes → the tree IS the linear search space)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import Recognizer
from speechrecognition_tpu.search.tree_decoder import TreeTables, decode_batch_tree
from speechrecognition_tpu.tdp import TdpModel


@pytest.fixture(scope="module")
def setup(lexicon, fixtures_dir, demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=0, loop=c["tdp"][0], forward=c["tdp"][1],
                   skip=c["tdp"][2])
    return model.pack(dtype=jnp.float64), tdp, c


def test_tree_structure(lexicon, setup):
    _, tdp, c = setup
    tables = TreeTables.build(lexicon, tdp, c["word_penalty"])
    # no shared prefixes in SieTill: nodes = 1 root + Σ automaton lengths
    expected = 1 + sum(lexicon.get_automaton_for_word(w).num_states
                       for w in range(lexicon.num_words))
    assert tables.num_nodes == expected
    assert (tables.end_word >= 0).sum() == lexicon.num_words
    # silence: word-end leaf without loop
    sil_node = np.nonzero(tables.end_word == lexicon.silence_idx)[0][0]
    assert not tables.loop_allowed[sil_node]
    assert tables.exit_penalty[sil_node] == 0.0


def test_tree_equals_linear_unpruned(lexicon, setup, demo_corpus,
                                     demo_recognition):
    pack, tdp, c = setup
    tables = TreeTables.build(lexicon, tdp, c["word_penalty"])
    feats, lens = demo_corpus.padded_batch(list(range(35)))
    hyps_tree = decode_batch_tree(pack, feats, lens, tables,
                                  am_threshold=1e9, silence_idx=0,
                                  prune=False, dtype=jnp.float64)
    golden = {u["idx"]: u["hyp"] for u in demo_recognition["utts"]}
    for b in range(35):
        assert hyps_tree[b] == golden[b], (b, hyps_tree[b], golden[b])


def test_tree_pruned_matches_golden_wer(lexicon, setup, demo_corpus,
                                        demo_recognition):
    """With the standard threshold the pruned tree search must reproduce
    the golden transcripts too (exit-penalty timing shifts in-word scores
    by ≤ wp, well inside the 200 beam)."""
    pack, tdp, c = setup
    tables = TreeTables.build(lexicon, tdp, c["word_penalty"])
    feats, lens = demo_corpus.padded_batch(list(range(35)))
    hyps = decode_batch_tree(pack, feats, lens, tables,
                             am_threshold=c["am_threshold"], silence_idx=0,
                             dtype=jnp.float64)
    golden = {u["idx"]: u["hyp"] for u in demo_recognition["utts"]}
    mismatches = [b for b in range(35) if hyps[b] != golden[b]]
    assert not mismatches, mismatches


def test_recognizer_tree_mode(lexicon, setup, demo_corpus, demo_recognition):
    """The Recognizer driver with search-type=tree must reproduce the
    golden metrics end-to-end."""
    from speechrecognition_tpu.config import Configuration
    from speechrecognition_tpu.search.decoder import Recognizer
    pack, tdp, c = setup
    config = Configuration({"am-threshold": c["am_threshold"],
                            "word-penalty": c["word_penalty"],
                            "pruned-search": True, "search-type": "tree",
                            "max-recognition-runs": 10000})
    rec = Recognizer(config, lexicon, tdp, pack, dtype=jnp.float64)
    res = rec.recognize_corpus(demo_corpus, batch_size=35)
    ref = demo_recognition["corpus"]
    assert abs(res["wer"] - ref["wer"]) < 1e-3
    assert res["substitutions"] == ref["sid"][0]
