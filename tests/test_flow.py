"""Flow network engine tests: parse + execute the reference's real
cache.lda.flow graph (with its two nested subnetworks) and match the
direct FeatureCache → SlidingWindowLDA pipeline bit-for-bit."""

import os

import numpy as np
import pytest

from speechrecognition_tpu.sprint.flow import BUILTIN_FILTERS, FlowNetwork

DATA = "/root/reference/src/example-setup/data"
CONFIG = "/root/reference/src/example-setup/config"
needs_an4 = pytest.mark.skipif(not os.path.isdir(DATA), reason="AN4 data absent")


@needs_an4
def test_parse_cache_lda_flow():
    net = FlowNetwork.parse(
        f"{CONFIG}/cache.lda.flow",
        config={"base-feature-extraction-cache.path":
                f"{DATA}/mfcc.features.recognition.cache",
                "lda.file": f"{DATA}/lda-1.matrix"})
    assert net.outputs == ["features"]
    assert "id" in net.params
    # all three files inlined: cache node + window node + matmul node
    assert set(net.nodes) == {"base-feature-extraction-cache",
                              "lda/window/lda-window", "lda/multiplication"}
    assert net.nodes["lda/window/lda-window"].attrs["max-size"] == "9"
    assert net.nodes["lda/window/lda-window"].attrs["right"] == "4"
    assert net.nodes["lda/multiplication"].attrs["file"].endswith("lda-1.matrix")


@needs_an4
def test_flow_matches_direct_lda_pipeline():
    from speechrecognition_tpu.sprint import (BlissCorpus, FeatureCache,
                                              SlidingWindowLDA,
                                              read_matrix_xml)
    corpus = BlissCorpus.read(f"{DATA}/an4_test.20081021.corpus.gz")
    cache = FeatureCache(f"{DATA}/mfcc.features.recognition.cache")
    lda = SlidingWindowLDA(read_matrix_xml(f"{DATA}/lda-1.matrix"),
                           max_size=9, right=4)
    net = FlowNetwork.parse(
        f"{CONFIG}/cache.lda.flow",
        config={"base-feature-extraction-cache.path":
                f"{DATA}/mfcc.features.recognition.cache",
                "lda.file": f"{DATA}/lda-1.matrix"})
    ctx = {}
    for seg in corpus.segments[:5]:
        key = corpus.full_segment_name(seg)
        out = net.run(params={"id": key}, context=ctx)["features"]
        base, _t = cache.read_features(key)
        expect = lda(base)
        np.testing.assert_allclose(out, expect, rtol=0, atol=0)


def test_flow_simple_filters(tmp_path):
    """Hand-written network exercising normalization + preemphasis and
    network input ports."""
    p = tmp_path / "simple.flow"
    p.write_text("""<?xml version="1.0"?>
<network>
  <in name="in"/>
  <out name="out"/>
  <node name="pre" filter="signal-preemphasis" alpha="1.0"/>
  <link from="network:in" to="pre"/>
  <node name="norm" filter="signal-normalization" type="mean"/>
  <link from="pre" to="norm"/>
  <link from="norm" to="network:out"/>
</network>""")
    net = FlowNetwork.parse(str(p))
    x = np.arange(12, dtype=np.float64).reshape(6, 2)
    out = net.run(inputs={"in": x})["out"]
    pre = x.copy()
    pre[1:] -= x[:-1]
    pre[0] *= 0.0
    expect = pre - pre.mean(axis=0, keepdims=True)
    np.testing.assert_allclose(out, expect)
