"""Hybrid-NN training end-to-end on the demo corpus with the oracle
alignment as targets (the reference train-nn action)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.config import Configuration
from speechrecognition_tpu.models.nn import MLP, NNScorer, layer_specs_from_config
from speechrecognition_tpu.train.nn_training import (MiniBatchBuilder, NnTrainer,
                                                     compute_prior_from_alignment)


@pytest.fixture(scope="module")
def nn_setup(demo_corpus, fixtures_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("nn")
    config = Configuration({
        "target-file": str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"),
        "context-frames": 1,
        "cv-size": 0.1,
        "batch-size": 8,
        "num-epochs": 25,
        "updater": "sgd",
        "learning-rate": 0.5,
        "gradient-check": False,
        "output-dir": str(out / "models"),
        "nn-training-stats-path": str(out / "nn_stats.data"),
        "layers": [
            {"layer-name": "hidden-layer1", "num-outputs": 50,
             "type": "feed-forward", "nonlinearity": "sigmoid", "input": ["data"]},
            {"layer-name": "output-layer", "num-outputs": 106,
             "type": "output", "input": ["hidden-layer1"]},
        ],
    })
    builder = MiniBatchBuilder.from_config(config, demo_corpus, 8, 106, 0)
    mlp = MLP(layer_specs_from_config(config), input_dim=builder.feature_size)
    return config, builder, mlp, out


def test_minibatch_builder_shapes(nn_setup, demo_corpus):
    config, builder, mlp, out = nn_setup
    assert builder.feature_size == 25 * 3
    assert builder.num_train_batches >= 3
    feats, targets, mask = builder.build_batch(0, cv=False)
    T, B, D = feats.shape
    assert D == 75 and B == 8
    assert targets.shape == (T, B, 106)
    # every valid frame has exactly one target
    for b in range(B):
        L = int(mask[b])
        if L:
            assert np.allclose(targets[:L, b].sum(axis=-1), 1.0)
            assert np.all(targets[L:, b] == 0.0)


def test_nn_training_learns(nn_setup):
    config, builder, mlp, out = nn_setup
    trainer = NnTrainer(config, builder, mlp, log=lambda *a: None)
    result = trainer.train()
    # 106-class frame task: must beat the silence-majority baseline quickly
    assert result["train_fer"] < 0.55, result
    assert (out / "models" / "25").exists()
    assert (out / "nn_stats.data").exists()
    # scorer integration: finite scores with the right shape
    prior = compute_prior_from_alignment(builder.alignment, 106)
    log_prior = jnp.asarray(0.6 * np.log(np.maximum(prior, 1e-10)), jnp.float32)
    scorer = NNScorer(mlp, result["params"], log_prior, context_frames=1)
    feats = np.zeros((2, 40, 25), np.float32)
    am = np.asarray(scorer.am_batch(feats, 25))
    assert am.shape == (2, 40, 106)
    assert np.isfinite(am).all()


def test_prior_from_alignment(fixtures_dir):
    from speechrecognition_tpu.io import read_alignment
    states, _, _ = read_alignment(
        str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"))
    prior = compute_prior_from_alignment(states, 106)
    assert abs(prior.sum() - 1.0) < 1e-12
    assert prior[0] > 0.3   # silence dominates


def test_hybrid_nn_recognizer_end_to_end(nn_setup, demo_corpus, lexicon,
                                         fixtures_dir, tmp_path):
    """The recognize action's NN path: Recognizer with an NNScorer decodes
    the demo corpus (hybrid SieTill.cpp:115-135 with feature-scorer=nn).

    Uses the reference presentation's hybrid shape (1×150 sigmoid hidden,
    context 2, AdaDelta — main.tex:233,266) trained long enough on the
    35-utterance demo corpus that the softmax sharpens; a soft model can't
    outbid the free silence loop (TDP charges `forward` into silence on
    every jump, TdpModel.cpp:19-29, so silence self-loops cost 0)."""
    from speechrecognition_tpu.search.decoder import Recognizer
    from speechrecognition_tpu.tdp import TdpModel

    config = Configuration({
        "target-file": str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"),
        "context-frames": 2, "cv-size": 0.0, "batch-size": 8,
        "num-epochs": 150, "updater": "adadelta", "learning-rate": 1.0,
        "gradient-check": False,
        "output-dir": str(tmp_path / "models"),
        "nn-training-stats-path": str(tmp_path / "nn_stats.data"),
        "layers": [
            {"layer-name": "hidden-layer1", "num-outputs": 150,
             "type": "feed-forward", "nonlinearity": "sigmoid",
             "input": ["data"]},
            {"layer-name": "output-layer", "num-outputs": 106,
             "type": "output", "input": ["hidden-layer1"]},
        ],
    })
    builder = MiniBatchBuilder.from_config(config, demo_corpus, 8, 106, 0)
    mlp = MLP(layer_specs_from_config(config), input_dim=builder.feature_size)
    trainer = NnTrainer(config, builder, mlp, log=lambda *a: None)
    result = trainer.train()
    prior = compute_prior_from_alignment(builder.alignment, 106)
    log_prior = jnp.asarray(0.6 * np.log(np.maximum(prior, 1e-10)), jnp.float32)
    scorer = NNScorer(mlp, result["params"], log_prior, context_frames=2)

    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=1.0, forward=0.0, skip=10.0)
    rc = Configuration({"am-threshold": 200.0, "word-penalty": 10.0,
                        "pruned-search": True, "max-recognition-runs": 100})
    rec = Recognizer(rc, lexicon, tdp, pack=None)
    rec.nn_scorer = scorer
    res = rec.recognize_corpus(demo_corpus, batch_size=35)
    # trained on the demo corpus itself: must be far better than chance
    # (the reference full-corpus hybrid reaches 25.34% WER, main.tex:266;
    # this setup measures ≈20% here)
    assert np.isfinite(res["wer"])
    assert res["wer"] < 40.0, res["wer"]


def test_device_batch_matches_host_batch(nn_setup):
    """The on-device batch assembly (DeviceBatcher + gather_batch) must
    produce exactly the host-built (T,B,D) batches: same context windows,
    silence truncation, one-hot targets and masks."""
    import jax.numpy as jnp
    from speechrecognition_tpu.train.nn_training import (DeviceBatcher,
                                                         gather_batch)

    config, builder, mlp, _out = nn_setup
    batcher = DeviceBatcher(builder)
    for cv in (False, True):
        n = builder.num_cv_batches if cv else builder.num_train_batches
        for b in range(min(n, 2)):
            f_h, t_h, m_h = builder.build_batch(b, cv=cv)
            base, lens, T = batcher.batch_meta(b, cv=cv)
            f_d, t_d, mask_d = gather_batch(
                batcher.flat, batcher.align, jnp.asarray(base),
                jnp.asarray(lens), T, builder.context_frames,
                builder.num_classes)
            f_d, t_d = np.asarray(f_d), np.asarray(t_d)
            np.testing.assert_array_equal(lens, np.minimum(m_h, T))
            # bucketed T may exceed the host batch's global max length (or
            # vice versa); both pads carry only zeros
            n = min(T, f_h.shape[0])
            # + 0.0 normalizes the mask-multiply's −0.0 against the host's 0.0
            np.testing.assert_array_equal(f_d[:n] + 0.0, f_h[:n] + 0.0)
            np.testing.assert_array_equal(t_d[:n], t_h[:n])
            assert np.all(f_h[n:] == 0) and np.all(t_h[n:] == 0)
            assert np.all(f_d[n:] == 0) and np.all(t_d[n:] == 0)
