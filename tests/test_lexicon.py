import numpy as np

from speechrecognition_tpu.lexicon import build_sietill_lexicon, build_segment_automaton


def test_sietill_lexicon_layout():
    lex = build_sietill_lexicon()
    assert lex.num_words == 12
    assert lex.num_states == 106          # Lexicon.cpp:70-85
    assert lex.silence_idx == 0
    assert lex.silence_state == 0
    assert lex.get_automaton_for_word(1).first_state == 1   # "eins"
    assert lex.get_automaton_for_word(1).num_states == 18   # 9 states × 2 reps
    assert lex.get_automaton_for_word(5).num_states == 24   # "fuenf": 12 × 2
    assert lex.max_positions == 24
    tbl = lex.state_table()
    assert tbl.shape == (12, 24)
    np.testing.assert_array_equal(tbl[0], np.zeros(24))     # silence padded


def test_segment_automaton():
    lex = build_sietill_lexicon()
    aut = build_segment_automaton(lex, [1, 2])
    # sil + eins(18) + sil + zwei(18) + sil
    assert aut.num_states == 1 + 18 + 1 + 18 + 1
    assert aut.states[0] == 0 and aut.states[-1] == 0
    assert aut.states[1] == 1 and aut.states[2] == 1


def test_word_lookup():
    lex = build_sietill_lexicon()
    assert lex.word_idx("fuenf") == 5
    assert lex.orth_of([8, 5, 3]) == "acht fuenf drei"
