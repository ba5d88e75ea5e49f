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


def test_sietill_mfcc_flow_bit_exact(fixtures_dir):
    """The packaged audio→MFCC Flow network (sietill-mfcc.flow) reproduces
    the .mm2 demo feature fixtures bit-exactly: each DSP node
    (sietill-preemphasis → signal-window → FFT → amplitude → filterbank →
    ln → cosine-transform) matches SignalAnalysis.cpp:73-116."""
    import json
    import speechrecognition_tpu.sprint as sprint_pkg
    from speechrecognition_tpu.io import read_feature_file

    flow_path = os.path.join(os.path.dirname(sprint_pkg.__file__),
                             "flows", "sietill-mfcc.flow")
    net = FlowNetwork.parse(flow_path)
    assert net.outputs == ["features"]

    with open("/root/reference/src/sietill/corpora/demo_corpus.json") as f:
        segments = json.load(f)["segments"]
    audio_dir = "/root/reference/data/audio/"
    checked = 0
    for seg in segments[:5]:
        name = seg["name"]
        out = net.run(params={"input-file": f"{audio_dir}{name}.sph",
                              "id": name})
        got = out["features"].astype(np.float32)
        want = read_feature_file(
            str(fixtures_dir / "demo_features" / f"{name}.mm2")).reshape(-1, 12)
        np.testing.assert_array_equal(got, want)
        checked += 1
    assert checked == 5


def test_regression_node_first_and_second_order():
    """signal-regression vs a direct transcription of Regression.cc:25-66
    on a ragged random sequence (interior frames, no edge effects)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, 6))
    net_attrs = {"max-size": "5", "right": "2"}
    from speechrecognition_tpu.sprint.flow import f_regression

    for order in (1, 2):
        got = f_regression({"in": x}, {**net_attrs, "order": str(order)}, {})
        n = 5
        dt = np.arange(n) - (n - 1) / 2.0
        tm = (dt * dt).sum()
        for t in range(2, 38):
            win = x[t - 2: t + 3]
            if order == 1:
                want = (dt[:, None] * win).sum(axis=0) / tm
            else:
                ns = tm * tm - n * (dt ** 4).sum()
                want = ((win * tm - win * (dt * dt)[:, None] * n).sum(axis=0)
                        * 2.0 / ns)
            np.testing.assert_allclose(got[t], want, rtol=1e-12)
