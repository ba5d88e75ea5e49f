"""Legacy phonetic decision-tree loader (sprint/legacy_tree.py vs
Legacy/DecisionTree-legacy.c ReadDefFiles/BuildTree and
Legacy/DecisionTree.cc classify/draw)."""

import io

import pytest

from speechrecognition_tpu.sprint.legacy_tree import LegacyDecisionTree

# phonemes: a b si # | phone part (2 sections) | questions | pre-order tree
# Question indices after loading: 0=VOWEL(file), 1..3=STATE-0..2,
# singletons a=4, b=5 (no-pos-dep adds no position questions).
LEGACY_FILE = """a
b
si
#

phone part line 1
phone part line 2


VOWEL a

node(0,l,1)
node(1,c,2)
leaf(1)
leaf(2)
leaf(3,0)
"""
# tree: root asks VOWEL at context -1; yes-> asks STATE-0 (question 1)
#   yes->class 0, no->class 1;  root-no -> leaf class 2
# leaves store class+1 in the question field; n_clusters = max = 3,
# num_classes = 4 (class 3 = silence).


@pytest.fixture()
def tree(tmp_path):
    p = tmp_path / "legacy.tree"
    p.write_text(LEGACY_FILE)
    return LegacyDecisionTree.read(str(p))


def test_sections_parsed(tree):
    assert tree.phonemes == ["a", "b", "si", "#"]
    assert tree.silence_idx == 2 and tree.boundary_idx == 3
    names = [q.name for q in tree.questions]
    assert names == ["VOWEL", "STATE-0", "STATE-1", "STATE-2", "a", "b"]
    assert tree.n_clusters == 3 and tree.num_classes == 4


def test_classify_walk(tree):
    # center b, left a (VOWEL yes), state 0 (STATE-0 yes) → class 0
    assert tree.classify("b", 0, left="a") == 0
    # left a, state 2 → VOWEL yes, STATE-0 no → class 1
    assert tree.classify("b", 2, left="a") == 1
    # left b → VOWEL no → class 2
    assert tree.classify("b", 0, left="b") == 2
    # missing left context answers as the boundary phoneme "#" → VOWEL no
    assert tree.classify("a", 0) == 2
    # silence short-circuits to the last class
    assert tree.classify("si", 1, left="a") == 3


def test_boundary_styles(tmp_path):
    # pos-dep adds POSITION-WORD-BOUNDARY between states and singletons;
    # super-pos-dep adds three questions
    p = tmp_path / "legacy.tree"
    p.write_text(LEGACY_FILE)
    t1 = LegacyDecisionTree.read(str(p), boundary_style="pos-dep")
    assert [q.name for q in t1.questions][4] == "POSITION-WORD-BOUNDARY"
    assert t1.translate_boundary(0) == 0 and t1.translate_boundary(2) == 1
    t2 = LegacyDecisionTree.read(str(p), boundary_style="super-pos-dep")
    assert [q.name for q in t2.questions][4:7] == [
        "ONE-PHONEME-WORD", "POSITION-WORD-BEGINNING", "POSITION-WORD-END"]
    # translateBoundaryFlag: within 0, initial 2, final 3, both 1
    assert [t2.translate_boundary(f) for f in (0, 1, 2, 3)] == [0, 2, 3, 1]


def test_position_question_classify(tmp_path):
    """A super-pos-dep tree branching on POSITION-WORD-BEGINNING
    (question index 5 after the file question + 3 states + index 4)."""
    content = LEGACY_FILE.replace(
        "node(0,l,1)\nnode(1,c,2)\nleaf(1)\nleaf(2)\nleaf(3,0)\n",
        "node(5,c,1)\nleaf(1)\nleaf(2)\n")
    p = tmp_path / "legacy2.tree"
    p.write_text(content)
    t = LegacyDecisionTree.read(str(p), boundary_style="super-pos-dep")
    assert t.classify("a", 0, boundary_flag=1) == 0   # word-initial → yes
    assert t.classify("a", 0, boundary_flag=0) == 1


def test_missing_specials_rejected(tmp_path):
    p = tmp_path / "bad.tree"
    p.write_text("a\nb\n\nphone\n\n\nQ a\n\nleaf(1)\n".replace("Q a", "Q a"))
    with pytest.raises(ValueError, match="boundary not defined"):
        LegacyDecisionTree.read(str(p))


def test_draw_dot(tree):
    out = io.StringIO()
    tree.draw(out)
    s = out.getvalue()
    assert s.startswith("digraph") and "VOWEL" in s and "class: 2" in s
    assert s.count("[label=\"yes\"]") == 2
