"""Decoder parity on the demo corpus: transcripts must be identical to the
reference C++ decoder run on the same model (oracle fixture)."""

import numpy as np
import pytest

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import Recognizer
from speechrecognition_tpu.search.edit_distance import edit_distance
from speechrecognition_tpu.tdp import TdpModel


@pytest.fixture(scope="module")
def recognizer(lexicon, fixtures_dir, demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING, max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    import jax.numpy as jnp
    config = Configuration({"am-threshold": c["am_threshold"],
                            "word-penalty": c["word_penalty"],
                            "pruned-search": True,
                            "max-recognition-runs": 10000})
    return Recognizer(config, lexicon, tdp, model.pack(dtype=jnp.float64),
                      dtype=jnp.float64)


def test_transcript_parity(recognizer, demo_corpus, demo_recognition):
    result = recognizer.recognize_corpus(demo_corpus, batch_size=35)
    mismatches = []
    for utt in demo_recognition["utts"]:
        mine = result["hyps"][utt["idx"]]
        if mine != utt["hyp"]:
            mismatches.append((utt["idx"], mine, utt["hyp"]))
    assert not mismatches, f"{len(mismatches)} transcript mismatches: {mismatches[:5]}"


def test_corpus_metrics_parity(recognizer, demo_corpus, demo_recognition):
    result = recognizer.recognize_corpus(demo_corpus, batch_size=35)
    ref = demo_recognition["corpus"]
    assert abs(result["wer"] - ref["wer"]) < 1e-3
    assert abs(result["ser"] - ref["ser"]) < 1e-3
    s, i, d = ref["sid"]
    assert result["substitutions"] == s
    assert result["insertions"] == i
    assert result["deletions"] == d


def test_per_utt_edit_distance_parity(demo_recognition):
    """Our edit-distance must reproduce the reference's S/I/D per utterance
    given the same hyp/ref pairs (including its quirky first column)."""
    for utt in demo_recognition["utts"]:
        ed = edit_distance(utt["ref"], utt["hyp"])
        assert [ed.substitute_count, ed.insert_count, ed.delete_count] == utt["sid"], utt


def test_unpruned_decoder_agrees(recognizer, demo_corpus, lexicon, fixtures_dir,
                                 demo_recognition):
    """Cross-check: the full (unpruned) decoder must produce the same
    transcripts as the pruned one at this wide beam (reference has the same
    A/B pair, Recognizer.cpp:52-56)."""
    from speechrecognition_tpu.config import Configuration as Cfg
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING, max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    import jax.numpy as jnp
    config = Cfg({"am-threshold": c["am_threshold"],
                  "word-penalty": c["word_penalty"],
                  "pruned-search": False, "max-recognition-runs": 10000})
    full = Recognizer(config, lexicon, tdp, model.pack(dtype=jnp.float64),
                      dtype=jnp.float64)
    r_full = full.recognize_corpus(demo_corpus, batch_size=35)
    r_pruned = recognizer.recognize_corpus(demo_corpus, batch_size=35)
    assert r_full["hyps"] == r_pruned["hyps"]
