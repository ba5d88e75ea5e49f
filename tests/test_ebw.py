"""Discriminative EBW/MMI training tests on the demo corpus: the MMI
criterion must improve after one iteration and recognition must not
degrade."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.io import read_alignment, read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.decoder import Recognizer
from speechrecognition_tpu.tdp import TdpModel
from speechrecognition_tpu.train.ebw import EbwConfig, EbwTrainer


@pytest.fixture(scope="module")
def setup(lexicon, fixtures_dir, demo_corpus, demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    align, _w, _m = read_alignment(
        str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"))
    assert len(align) == demo_corpus.total_frames
    return model, tdp, c, align.astype(np.int64)


def test_ebw_iteration_improves_mmi(setup, lexicon, demo_corpus,
                                    demo_recognition):
    model, tdp, c, align = setup
    cfg = EbwConfig(e_constant=2.0, i_smoothing_tau=10.0,
                    word_penalty=c["word_penalty"],
                    am_threshold=c["am_threshold"], batch_size=35)
    trainer = EbwTrainer(cfg, lexicon, model, tdp, dtype=jnp.float64)
    stats = trainer.iterate(demo_corpus, align)

    # statistics sanity: numerator mass = every frame once; denominator
    # mass ≈ frames (posteriors sum to ~1 per frame, minus pruned tails)
    n = demo_corpus.total_frames
    assert stats["num_frames_mass"] == pytest.approx(n, rel=1e-6)
    assert 0.5 * n < stats["den_frames_mass"] < 1.2 * n

    # the MMI criterion (−log p_num + log p_den per frame) must go down
    assert stats["criterion_after"] < stats["criterion_before"], stats

    # recognition with the discriminatively-updated model must not
    # degrade vs the ML model's golden WER
    config = Configuration({"am-threshold": c["am_threshold"],
                            "word-penalty": c["word_penalty"],
                            "pruned-search": True})
    rec = Recognizer(config, lexicon, tdp, model.pack(dtype=jnp.float64),
                     dtype=jnp.float64)
    res = rec.recognize_corpus(demo_corpus, batch_size=35)
    assert res["wer"] <= demo_recognition["corpus"]["wer"] + 1e-9, res["wer"]


def test_ebw_update_survives_mix_round_trip(setup, lexicon, demo_corpus,
                                            tmp_path):
    """The .mix format stores ACCUMULATORS and re-finalizes on load —
    a discriminative update must be encoded back into them
    (sync_accumulators_to_parameters) or checkpoints silently revert to
    the ML model (the round-4 MPE resume bug)."""
    import jax.numpy as jnp

    from speechrecognition_tpu.io import write_mixture_set
    from speechrecognition_tpu.models import gmm as gmm_mod

    model, tdp, c, align = setup
    cfg = EbwConfig(e_constant=2.0, i_smoothing_tau=10.0,
                    word_penalty=c["word_penalty"],
                    am_threshold=c["am_threshold"], batch_size=35)
    trainer = EbwTrainer(cfg, lexicon, model, tdp, dtype=jnp.float64)
    num = trainer.numerator_statistics(demo_corpus, align)
    lats = trainer.decode_lattices(demo_corpus)
    den = trainer.denominator_statistics(demo_corpus, lats)
    trainer.ebw_update(num, den)

    p = str(tmp_path / "ebw.mix")
    write_mixture_set(p, model.to_raw())
    reloaded = MixtureModel.from_raw(
        read_mixture_set(p, 25), model.var_model, max_approx=True)

    feats = demo_corpus.features[:256]
    a = np.asarray(gmm_mod.am_scores(model.pack(dtype=jnp.float64),
                                     jnp.asarray(feats)))
    b = np.asarray(gmm_mod.am_scores(reloaded.pack(dtype=jnp.float64),
                                     jnp.asarray(feats)))
    np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-8)
