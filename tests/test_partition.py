"""Corpus partitioning + WER-vs-threshold sweep driver (wer-plotting
parity: src/wer-plotting/gnuplot/test/time.data format)."""

import numpy as np

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import Recognizer
from speechrecognition_tpu.tdp import TdpModel
from speechrecognition_tpu.tools.partition import (partition_segments,
                                                   per_group_wer,
                                                   subset_corpus,
                                                   wer_vs_threshold,
                                                   write_time_data)


def test_partition_and_subset(demo_corpus, demo_description):
    groups = partition_segments(demo_description, "speaker")
    assert sum(len(v) for v in groups.values()) == demo_corpus.num_segments
    ids = next(iter(groups.values()))
    sub = subset_corpus(demo_corpus, ids)
    assert sub.num_segments == len(ids)
    for j, s in enumerate(ids):
        np.testing.assert_array_equal(sub.feature_sequence(j),
                                      demo_corpus.feature_sequence(s))
        assert sub.orths[j] == demo_corpus.orths[s]
        assert sub.names[j] == demo_corpus.names[s]

    genders = partition_segments(demo_description, "gender")
    assert sum(len(v) for v in genders.values()) == demo_corpus.num_segments


def _make_recognizer(lexicon, pack, tdp, c):
    def make(thr):
        config = Configuration({"am-threshold": thr,
                                "word-penalty": c["word_penalty"],
                                "pruned-search": True,
                                "max-recognition-runs": 10 ** 9})
        return Recognizer(config, lexicon, tdp, pack, dtype=jnp.float64)
    return make


def test_wer_threshold_sweep(tmp_path, lexicon, fixtures_dir, demo_corpus,
                             demo_recognition, demo_description):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    pack = model.pack(dtype=jnp.float64)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    make = _make_recognizer(lexicon, pack, tdp, c)

    records = wer_vs_threshold(make, demo_corpus, [25.0, 200.0],
                               batch_size=35)
    assert [r["threshold"] for r in records] == [25.0, 200.0]
    # the golden fixture is decoded at threshold 200
    assert abs(records[1]["wer"] - demo_recognition["corpus"]["wer"]) < 1e-5
    # a very tight beam can only hurt (or tie)
    assert records[0]["wer"] >= records[1]["wer"]

    out = tmp_path / "time.data"
    write_time_data(records, str(out))
    lines = out.read_text().splitlines()
    assert lines[0].startswith("25 ") and lines[1].startswith("200 ")

    by_gender = per_group_wer(make(c["am_threshold"]), demo_corpus,
                              demo_description, "gender", batch_size=35)
    # weighted word errors across partitions == corpus-level errors
    groups = partition_segments(demo_description, "gender")
    ref_words = {g: sum(len(demo_corpus.orths[s]) for s in ids)
                 for g, ids in groups.items()}
    total_err = sum(r["wer"] / 100.0 * ref_words[g]
                    for g, r in by_gender.items())
    corpus_res = make(c["am_threshold"]).recognize_corpus(demo_corpus,
                                                          batch_size=35)
    all_ref = sum(len(o) for o in demo_corpus.orths)
    assert abs(total_err - corpus_res["wer"] / 100.0 * all_ref) < 1e-6
