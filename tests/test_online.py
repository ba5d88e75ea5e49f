"""Streaming recognition: transcripts bit-identical to offline decoding.

The reference's per-frame feed() contract
(Speech/Recognizer.hh:37-110, Search/Search.hh:33-72) is realized as
chunk-committed streaming over the offline decoder's own two compiled
programs (search/online.py) — so feeding the demo corpus in arbitrary
piece sizes must reproduce the offline transcripts exactly, and
partial() must be callable at any point without disturbing the stream."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import (DecoderTables, decode_batch,
                                                  decode_batch_df)
from speechrecognition_tpu.search.online import OnlineRecognizer
from speechrecognition_tpu.tdp import TdpModel


@pytest.fixture(scope="module")
def setup(lexicon, demo_corpus, fixtures_dir):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    tdp = TdpModel(silence_state=lexicon.silence_state, loop=3.0,
                   forward=0.0, skip=30.0)
    tables = DecoderTables.build(lexicon, tdp, word_penalty=80.0)
    n = demo_corpus.num_segments
    feats, lens = demo_corpus.padded_batch(list(range(n)))
    return model, tables, feats, np.asarray(lens)


@pytest.mark.parametrize("feed_size", [37, 160])
def test_streaming_matches_offline_f64(setup, lexicon, feed_size):
    model, tables, feats, lens = setup
    pack = model.pack(dtype=jnp.float64)
    offline = decode_batch(pack, feats, lens, tables, 200.0,
                           lexicon.silence_idx, dtype=jnp.float64)

    online = OnlineRecognizer(pack, tables, 200.0, lexicon.silence_idx,
                              dtype=jnp.float64,
                              num_streams=feats.shape[0])
    T = feats.shape[1]
    partials = 0
    for start in range(0, T, feed_size):
        online.feed(feats[:, start:start + feed_size])
        if partials < 2:     # partial() must not disturb the stream
            online.partial(lens)
            partials += 1
    got = online.finish(lens)
    assert got == offline

    stats = online.latency_stats
    assert stats["commit"]["n"] >= 1
    assert stats["partial"]["n"] == partials + 1   # finish() is a partial


def test_streaming_matches_offline_df32(setup, lexicon):
    """The production bit-parity path streams too."""
    model, tables, feats, lens = setup
    packdf = model.pack_df()
    offline = decode_batch_df(packdf, feats, lens, tables, 200.0,
                              lexicon.silence_idx)
    online = OnlineRecognizer(packdf, tables, 200.0, lexicon.silence_idx,
                              dtype="df32", num_streams=feats.shape[0])
    online.feed(feats)
    assert online.finish(lens) == offline


def test_partial_before_any_feed(setup, lexicon):
    """partial()/finish() are callable at ANY point, including right
    after construction or restart() (round-4 review fix)."""
    model, tables, feats, lens = setup
    pack = model.pack(dtype=jnp.float64)
    online = OnlineRecognizer(pack, tables, 200.0, lexicon.silence_idx,
                              dtype=jnp.float64, num_streams=3)
    assert online.partial() == [[], [], []]
    assert online.finish() == [[], [], []]
    online.restart()
    assert online.partial() == [[], [], []]


def test_streaming_restart(setup, lexicon):
    """restart() fully resets: the second utterance pass reproduces the
    first (SearchAlgorithm::restart semantics)."""
    model, tables, feats, lens = setup
    pack = model.pack(dtype=jnp.float64)
    online = OnlineRecognizer(pack, tables, 200.0, lexicon.silence_idx,
                              dtype=jnp.float64, num_streams=feats.shape[0])
    online.feed(feats)
    first = online.finish(lens)
    online.restart()
    online.feed(feats)
    assert online.finish(lens) == first
