"""Flf processor network: config-driven lattice dataflow + the
FwdBwd/MBR/gamma-correction algorithms (search/flf_network.py vs the
reference's Flf/Network.cc + NodeRegistration.hh node catalog)."""

import math
import os

import numpy as np
import pytest

from speechrecognition_tpu.search.flf import LatticeArchive
from speechrecognition_tpu.search.flf_network import (
    FlfNetwork, arc_confidence, frame_posterior_cn, fwdbwd_posteriors,
    gamma_correction_func, gamma_correct_cn, local_cost_decode)
from speechrecognition_tpu.search.lattice import Arc, WordLattice
from speechrecognition_tpu.sprint.config import SprintConfig

VOCAB = ["[silence]", "eins", "zwei", "drei"]


def _toy_lattice():
    """Two competing readings: 'eins zwei' (strong) vs 'drei zwei'."""
    arcs = [
        Arc(start=0, end=3, word=1, score=1.0),
        Arc(start=0, end=3, word=3, score=3.0),
        Arc(start=3, end=6, word=2, score=1.0),
        Arc(start=3, end=6, word=0, score=4.0),
        Arc(start=0, end=6, word=0, score=9.0),
    ]
    return WordLattice(num_frames=6, arcs=arcs, silence=0)


def test_fwdbwd_posteriors_normalized():
    lat = _toy_lattice()
    post = fwdbwd_posteriors(lat)
    # posteriors of arcs crossing any cut sum to 1
    pcn = frame_posterior_cn(lat, post)
    for t in range(6):
        total = sum(pcn[t].values())
        assert total <= 1.0 + 1e-9
    # frames 0-2: eins vs drei vs the long silence arc; arc posterior is
    # the PATH mass through the arc over the total path mass
    paths = {"12": 1.0 + 1.0, "10": 1.0 + 4.0, "32": 3.0 + 1.0,
             "30": 3.0 + 4.0, "s": 9.0}
    z = sum(math.exp(-v) for v in paths.values())
    want_p1 = (math.exp(-paths["12"]) + math.exp(-paths["10"])) / z
    want_p3 = (math.exp(-paths["32"]) + math.exp(-paths["30"])) / z
    assert abs(pcn[0][1] - want_p1) < 1e-9
    assert abs(pcn[0][3] - want_p3) < 1e-9
    assert pcn[0][1] > pcn[0][3]


def test_arc_confidence_matches_frame_average():
    lat = _toy_lattice()
    post = fwdbwd_posteriors(lat)
    conf = arc_confidence(lat, post)
    pcn = frame_posterior_cn(lat, post)
    a = lat.arcs[0]
    want = sum(pcn[t][1] for t in range(0, 3)) / 3
    assert abs(conf[a] - want) < 1e-12


def test_local_cost_decode_prefers_high_posterior():
    lat = _toy_lattice()
    words, risk = local_cost_decode(lat)
    assert [w for w in words if w != 0] == [1, 2]
    assert risk >= 0.0


def test_local_cost_decode_differs_from_map_when_mass_splits():
    """MBR picks the labels with the larger TOTAL posterior even when the
    single best path uses another label: three alternatives sharing a
    first-half arc outweigh the one strong whole-span path."""
    arcs = [Arc(start=0, end=4, word=1, score=2.0),
            Arc(start=0, end=2, word=2, score=1.0),
            Arc(start=2, end=4, word=3, score=1.5),
            Arc(start=2, end=4, word=4, score=1.6),
            Arc(start=2, end=4, word=5, score=1.7)]
    lat = WordLattice(num_frames=4, arcs=arcs, silence=0)
    map_words, _ = lat.best_path()
    mbr_words, _ = local_cost_decode(lat)
    assert map_words == [1]
    assert mbr_words == [2, 3]


def test_gamma_correction_func_reference_formula():
    """Exact replication of GammaCorrection.cc:22-36 incl. breakpoint."""
    for x, g in ((0.1, 2.0), (0.3, 2.0), (0.5, 3.0), (0.9, 0.5), (1.2, 2.0)):
        got = gamma_correction_func(x, g)
        if x >= 1.0:
            want = 1.0
        elif x > 0.3:
            m = 0.7
            want = (1.0 - (1.0 - (x - 0.3) / m) ** g) * m + 0.3
        else:
            want = (x / 0.3) ** g * 0.3
        assert abs(got - want) < 1e-15
    # identity fixed points
    assert gamma_correction_func(0.3, 5.0) == pytest.approx(0.3)
    assert gamma_correction_func(1.0, 5.0) == 1.0
    assert gamma_correction_func(1e-30, 4.0) >= 1e-12


def test_gamma_correct_cn_sharpens_and_normalizes():
    from speechrecognition_tpu.search.flf import CnSlot
    slots = [CnSlot(start=0, end=2, probs={1: 0.6, 2: 0.4})]
    out = gamma_correct_cn(slots, gamma=3.0)
    assert out[0].probs[1] > 0.6        # winner sharpened
    assert sum(out[0].probs.values()) <= 1.0 + 1e-12


def _write_network_config(tmp_path, arch_in, arch_out, transcripts):
    p = tmp_path / "net.config"
    p.write_text(f"""
[network]
initial-nodes = reader

[network.reader]
type   = archive-reader
path   = {arch_in}
links  = 0->fb:0

[network.fb]
type   = FB-builder
links  = 0->conf:0 0->decoder:0

[network.conf]
type   = add-word-confidence
links  = 0->cn:0

[network.cn]
type   = center-frame-CN-builder
links  = 0->gamma:0

[network.gamma]
type   = CN-gamma-correction
gamma  = 2.0
links  = 0->cndec:0

[network.cndec]
type   = CN-decoder
links  = 0->eval:0

[network.eval]
type        = evaluator
transcripts = {transcripts}
links       = 0->sink:0

[network.decoder]
type         = local-cost-decoder
word-penalty = 0.5
links        = 0->writerprep:0

[network.writerprep]
type  = copy
links = 0->sink:0

[network.sink]
type = sink
""")
    return str(p)


def test_network_end_to_end(tmp_path):
    """A 10-node network (reader → FB → confidence → CN → gamma →
    CN-decode → evaluator, plus a local-cost-decoder branch) over a
    lattice archive — the reference Flf tool's execution model."""
    arch_dir = tmp_path / "lats"
    arch = LatticeArchive(str(arch_dir), VOCAB)
    arch.write("seg-1", _toy_lattice())
    trans = tmp_path / "refs.txt"
    trans.write_text("seg-1\teins zwei\n")

    cfg_path = _write_network_config(tmp_path, arch_dir, tmp_path / "out",
                                     trans)
    import io
    net = FlfNetwork.parse(SprintConfig.read(cfg_path), VOCAB, silence=0)
    assert len(net.nodes) == 10
    out = io.StringIO()
    results = net.run(["seg-1"], out=out)
    r = results["seg-1"]
    assert r["cndec"] == [1, 2]           # CN decode
    assert r["decoder"] == [1, 2]         # MBR decode
    assert r["eval"] == (0, 2)            # 0 errors / 2 ref words
    text = out.getvalue()
    assert "eins zwei" in text and "risk=" in text


def test_extra_node_types(tmp_path):
    """concatenate / map-labels / filter / remove-null-arcs /
    dump-traceback / properties behave as their Flf counterparts."""
    import io

    from speechrecognition_tpu.search.flf_network import (
        n_concatenate, n_dump_traceback, n_filter, n_map_labels,
        n_properties, n_remove_null_arcs)

    lat = _toy_lattice()
    cat = n_concatenate({0: lat, 1: lat}, {}, {})
    assert cat.num_frames == 12 and len(cat.arcs) == 10
    assert max(a.end for a in cat.arcs) == 12

    mapped = n_map_labels({0: lat}, {"map": "1:3"}, {})
    assert {a.word for a in mapped.arcs} == {0, 2, 3}

    filt = n_filter({0: lat}, {"max-score": "3.5", "drop-words": "2"}, {})
    assert all(a.score <= 3.5 and a.word != 2 for a in filt.arcs)

    withnull = WordLattice(num_frames=6,
                           arcs=lat.arcs + [Arc(2, 2, 1, 0.5)], silence=0)
    assert len(n_remove_null_arcs({0: withnull}, {}, {}).arcs) == len(lat.arcs)

    net = FlfNetwork({}, VOCAB)
    out = io.StringIO()
    ctx = {"id": "seg", "net": net, "out": out}
    n_properties({0: lat}, {}, ctx)
    assert "arcs=5" in out.getvalue()
    n_dump_traceback({0: lat}, {}, ctx)
    assert "eins" in out.getvalue() and "zwei" in out.getvalue()


def test_fb_builder_links_to_any_lattice_node(tmp_path):
    """FB-builder's (lattice, posteriors) output must be consumable by
    every lattice node (the docstring's own `FB-builder links = best`
    topology crashed before round 4's review fix)."""
    import io

    arch_dir = tmp_path / "lats"
    arch = LatticeArchive(str(arch_dir), VOCAB)
    arch.write("seg-1", _toy_lattice())
    p = tmp_path / "net.config"
    p.write_text(f"""
[network.reader]
type = archive-reader
path = {arch_dir}
links = fb
[network.fb]
type = FB-builder
links = best info prune
[network.best]
type = best
[network.info]
type = info
[network.prune]
type = prune-posterior
threshold = 50
""")
    net = FlfNetwork.parse(SprintConfig.read(str(p)), VOCAB)
    out = io.StringIO()
    r = net.run(["seg-1"], out=out)["seg-1"]
    assert r["best"] == [1, 2]
    assert "arcs=5" in out.getvalue()
    assert len(r["prune"].arcs) == 5


def test_network_attrs_resolve_config_variables(tmp_path):
    """$(var) references in node attributes resolve like everywhere
    else in the Sprint config system."""
    arch_dir = tmp_path / "lats"
    arch = LatticeArchive(str(arch_dir), VOCAB)
    arch.write("seg-1", _toy_lattice())
    p = tmp_path / "net.config"
    p.write_text(f"""
lattice-dir = {arch_dir}
[network.reader]
type = archive-reader
path = $(lattice-dir)
links = best
[network.best]
type = best
""")
    import io
    net = FlfNetwork.parse(SprintConfig.read(str(p)), VOCAB)
    r = net.run(["seg-1"], out=io.StringIO())["seg-1"]
    assert r["best"] == [1, 2]


def test_network_rejects_cycles_and_unknown_links(tmp_path):
    p = tmp_path / "bad.config"
    p.write_text("""
[network.a]
type = copy
links = b
[network.b]
type = copy
links = a
""")
    with pytest.raises(ValueError, match="cycle"):
        FlfNetwork.parse(SprintConfig.read(str(p)), VOCAB)
    p2 = tmp_path / "bad2.config"
    p2.write_text("""
[network.a]
type = copy
links = nosuch
""")
    with pytest.raises(ValueError, match="unknown node"):
        FlfNetwork.parse(SprintConfig.read(str(p2)), VOCAB)
