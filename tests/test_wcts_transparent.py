"""Transparent-silence WCTS equivalence.

The reference keeps the LM history THROUGH silence (silence has no
syntactic token; Teaching/LinearSearch.cc implements this with per-word
silence copies). The dense WCTS implements it by re-opening context c
when a silence ends inside tree copy c (search/wcts.py
transparent_silence). Equivalence oracle: the trusted linear bigram
decoder (search/ngram_decoder.py, brute-force-tested) run on an
EXPLICITLY EXTENDED lexicon containing one silence copy per context —
on a lexicon without shared prefixes the tree search and the linear
search explore identical spaces, so transcripts must agree exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.lexicon import Lexicon
from speechrecognition_tpu.search.decoder import BIG, DecoderTables
from speechrecognition_tpu.search.ngram_decoder import decode_batch_bigram
from speechrecognition_tpu.search.tree_decoder import TreeTables
from speechrecognition_tpu.search.wcts import decode_batch_wcts
from speechrecognition_tpu.tdp import TdpModel

SIL_COST = 2.5      # silence "exit" (no LM score: transparent)


def _base_lexicon():
    lex = Lexicon()
    lex.add_word("[silence]", 1, 1, silence=True)   # idx 0
    lex.add_word("a", 3, 1)                         # idx 1
    lex.add_word("b", 2, 1)                         # idx 2
    return lex


def _extended_lexicon():
    """Words a, b + three silence copies (after-start, after-a, after-b),
    every copy sharing the real silence's emitting state."""
    lex = Lexicon()
    lex.add_word("[silence]", 1, 1, silence=True)   # 0: after-start copy
    lex.add_word("a", 3, 1)                         # 1
    lex.add_word("b", 2, 1)                         # 2
    lex.add_word("[sil-a]", 1, 1)                   # 3
    lex.add_word("[sil-b]", 1, 1)                   # 4
    return lex


def _lm(rng):
    lm = rng.uniform(1.0, 8.0, size=(3, 3))
    lm_start = rng.uniform(1.0, 8.0, size=3)
    lm[:, 0] = SIL_COST     # silence column: exit cost only
    lm_start[0] = SIL_COST
    return lm, lm_start


def _extended_lm(lm, lm_start):
    """[5, 5] matrix over (sil0, a, b, sil_a, sil_b): silence copies keep
    their context; each context admits only its own copy."""
    big = float(BIG)
    W = 5
    ext = np.full((W, W), big)
    ext_start = np.full(W, big)
    # real-word columns
    for ctx, row in ((0, lm_start), (1, lm[1]), (2, lm[2]),
                     (3, lm[1]), (4, lm[2])):
        ext[ctx, 1] = row[1]
        ext[ctx, 2] = row[2]
    ext_start[1] = lm_start[1]
    ext_start[2] = lm_start[2]
    # silence-copy columns: context start→copy 0, a→copy 3, b→copy 4;
    # a copy may loop back into itself (silence chains)
    ext_start[0] = SIL_COST
    ext[0, 0] = SIL_COST
    ext[1, 3] = SIL_COST
    ext[2, 4] = SIL_COST
    ext[3, 3] = SIL_COST
    ext[4, 4] = SIL_COST
    return ext, ext_start


def _ext_states(base_lex, ext_lex):
    """Remap the extended lexicon's emission states so every silence copy
    emits the real silence state and a/b match the base lexicon."""
    mapping = np.arange(ext_lex.num_states)
    base_states = {w: base_lex.get_automaton_for_word(w).states
                   for w in range(3)}
    for w, src in ((0, 0), (1, 1), (2, 2), (3, 0), (4, 0)):
        dst = ext_lex.get_automaton_for_word(w).states
        for i, s in enumerate(dst):
            mapping[int(s)] = int(base_states[src][i])
    return mapping


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_transparent_silence_matches_silence_copies(seed):
    rng = np.random.default_rng(seed)
    base = _base_lexicon()
    ext = _extended_lexicon()
    tdp = TdpModel(silence_state=0, loop=1.0, forward=0.0, skip=4.0)
    lm, lm_start = _lm(rng)

    T = 14
    am_base = rng.uniform(0.0, 6.0, size=(1, T, base.num_states))
    # extended am: remap emission states onto the base inventory
    mapping = _ext_states(base, ext)
    am_ext = am_base[:, :, mapping[np.arange(ext.num_states)]]

    # oracle: linear bigram decode over the extended lexicon
    ext_lm, ext_lm_start = _extended_lm(lm, lm_start)
    tables_lin = DecoderTables.build(ext, tdp, word_penalty=0.0)
    hyps_lin = decode_batch_bigram(
        None, np.zeros((1, T, 1), np.float32), np.asarray([T]), tables_lin,
        ext_lm, ext_lm_start, 1e9, silence_idx=-1, prune=False,
        dtype=jnp.float64, am=jnp.asarray(am_ext))
    want = [w for w in hyps_lin[0] if w in (1, 2)]   # drop silence copies

    # transparent-silence WCTS over the base lexicon
    tree_tables = TreeTables.build(base, tdp, word_penalty=0.0)
    got = decode_batch_wcts(
        None, np.zeros((1, T, 1), np.float32), np.asarray([T]), tree_tables,
        tdp, lm, lm_start, 1e9, silence_idx=0, prune=False,
        dtype=jnp.float64, transparent_silence=True,
        am=jnp.asarray(am_base))
    assert got[0] == want, (seed, got[0], want)
