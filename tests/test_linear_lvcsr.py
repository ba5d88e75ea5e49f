"""Fast linear-lexicon LVCSR decoder (search/linear_lvcsr.py vs the
reference's complete Teaching/LinearSearch.cc design): per-predecessor
transparent-silence copies, bigram min-plus recombination, Sprint
transition semantics — equivalence-tested against the extended-lexicon
oracle and the AN4 system."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.lexicon import Lexicon
from speechrecognition_tpu.search.decoder import BIG, DecoderTables
from speechrecognition_tpu.search.linear_lvcsr import \
    decode_batch_linear_lvcsr
from speechrecognition_tpu.search.ngram_decoder import decode_batch_bigram
from speechrecognition_tpu.tdp import TdpModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/src/example-setup/data"
AM = os.path.join(REPO, "bench", "an4", "am.mix")

SIL_COST = 2.5


def _base_lexicon():
    lex = Lexicon()
    lex.add_word("[silence]", 1, 1, silence=True)
    lex.add_word("a", 3, 1)
    lex.add_word("b", 2, 1)
    return lex


def _extended_lexicon():
    lex = Lexicon()
    lex.add_word("[silence]", 1, 1, silence=True)   # after-start copy
    lex.add_word("a", 3, 1)
    lex.add_word("b", 2, 1)
    lex.add_word("[sil-a]", 1, 1)
    lex.add_word("[sil-b]", 1, 1)
    return lex


def _lm(rng):
    lm = rng.uniform(1.0, 8.0, size=(3, 3))
    lm_start = rng.uniform(1.0, 8.0, size=3)
    lm[:, 0] = SIL_COST
    lm_start[0] = SIL_COST
    return lm, lm_start


def _extended_lm(lm, lm_start):
    big = float(BIG)
    W = 5
    ext = np.full((W, W), big)
    ext_start = np.full(W, big)
    for ctx, row in ((0, lm_start), (1, lm[1]), (2, lm[2]),
                     (3, lm[1]), (4, lm[2])):
        ext[ctx, 1] = row[1]
        ext[ctx, 2] = row[2]
    ext_start[1] = lm_start[1]
    ext_start[2] = lm_start[2]
    ext_start[0] = SIL_COST
    ext[0, 0] = SIL_COST
    ext[1, 3] = SIL_COST
    ext[2, 4] = SIL_COST
    ext[3, 3] = SIL_COST
    ext[4, 4] = SIL_COST
    return ext, ext_start


def _ext_states(base_lex, ext_lex):
    mapping = np.arange(ext_lex.num_states)
    base_states = {w: base_lex.get_automaton_for_word(w).states
                   for w in range(3)}
    for w, src in ((0, 0), (1, 1), (2, 2), (3, 0), (4, 0)):
        dst = ext_lex.get_automaton_for_word(w).states
        for i, s in enumerate(dst):
            mapping[int(s)] = int(base_states[src][i])
    return mapping


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6])
def test_matches_silence_copy_oracle(seed):
    """Same oracle as test_wcts_transparent: the explicitly-extended
    lexicon (one silence copy per context) decoded by the trusted
    bigram decoder must agree with the linear LVCSR decoder's implicit
    per-predecessor silence copies."""
    rng = np.random.default_rng(seed)
    base = _base_lexicon()
    ext = _extended_lexicon()
    tdp = TdpModel(silence_state=0, loop=1.0, forward=0.0, skip=4.0)
    lm, lm_start = _lm(rng)

    T = 14
    am_base = rng.uniform(0.0, 6.0, size=(1, T, base.num_states))
    mapping = _ext_states(base, ext)
    am_ext = am_base[:, :, mapping[np.arange(ext.num_states)]]

    ext_lm, ext_lm_start = _extended_lm(lm, lm_start)
    tables_lin = DecoderTables.build(ext, tdp, word_penalty=0.0)
    hyps_ora = decode_batch_bigram(
        None, np.zeros((1, T, 1), np.float32), np.asarray([T]), tables_lin,
        ext_lm, ext_lm_start, 1e9, silence_idx=-1, prune=False,
        dtype=jnp.float64, am=jnp.asarray(am_ext))
    want = [w for w in hyps_ora[0] if w in (1, 2)]

    tables = DecoderTables.build(base, tdp, word_penalty=0.0)
    got = decode_batch_linear_lvcsr(
        None, np.zeros((1, T, 1), np.float32), np.asarray([T]), tables,
        lm, lm_start, 1e9, silence_idx=0, prune=False,
        dtype=jnp.float64, am=jnp.asarray(am_base))
    assert got[0] == want, (seed, got[0], want)


def test_all_silence_utterance():
    base = _base_lexicon()
    tdp = TdpModel(silence_state=0, loop=0.1, forward=0.0, skip=4.0)
    lm = np.full((3, 3), 50.0)
    lm[:, 0] = 0.1
    lm_start = np.full(3, 50.0)
    lm_start[0] = 0.1
    T = 8
    am = np.zeros((1, T, base.num_states))
    am[:, :, 1:] = 30.0              # only silence is plausible
    tables = DecoderTables.build(base, tdp, word_penalty=0.0)
    got = decode_batch_linear_lvcsr(
        None, np.zeros((1, T, 1), np.float32), np.asarray([T]), tables,
        lm, lm_start, 1e9, silence_idx=0, prune=False,
        dtype=jnp.float64, am=jnp.asarray(am))
    assert got[0] == []


an4_present = pytest.mark.skipif(
    not (os.path.isdir(DATA) and os.path.exists(AM)),
    reason="AN4 data or committed model absent")


@an4_present
def test_an4_slice_linear_vs_wcts_exact():
    """8-utterance AN4 slice: the linear decoder's exact transcripts
    equal the exact WCTS's, and pruning at the config beam changes
    nothing (the full-corpus A/B — 2/130 deltas where the LINEAR path
    is strictly cheaper — is recorded in bench/an4/RESULTS.md)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import an4_system as A
    from speechrecognition_tpu.io import read_mixture_set
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    from speechrecognition_tpu.search.wcts import decode_batch_wcts
    from speechrecognition_tpu.tools.partition import subset_corpus

    (_cfg, corpus_xml, asm, lex, tm, net, ap_thr, lm_scale) = \
        A.build_system()
    corpus_full, word_seqs = A.load_corpus(corpus_xml, lex, net)
    model = MixtureModel.from_raw(
        read_mixture_set(AM, corpus_full.dim),
        VarianceModel.GLOBAL_POOLING, max_approx=True)
    lm, lm_start = A.build_lm_matrices(lex, tm, lm_scale)
    n = 8
    corpus = subset_corpus(corpus_full, list(range(n)))
    feats, lens = corpus.padded_batch(list(range(n)))
    lens = np.asarray(lens)
    pack = model.pack(dtype=jnp.float32)

    tree_tables = tm.tree_tables(lex)
    want = decode_batch_wcts(
        pack, feats, lens, tree_tables, tm, lm, lm_start, 1e9,
        lex.silence_idx, prune=False, transparent_silence=True)

    tables = tm.decoder_tables(lex)
    got = decode_batch_linear_lvcsr(
        pack, feats, lens, tables, lm, lm_start, 1e9, lex.silence_idx,
        prune=False)
    assert got == [want[i] for i in range(n)]

    pruned = decode_batch_linear_lvcsr(
        pack, feats, lens, tables, lm, lm_start, ap_thr, lex.silence_idx,
        prune=True)
    assert pruned == got
