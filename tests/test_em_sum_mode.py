"""Sum-mode EM (max-approx=false) parity on the demo corpus.

The reference supports both membership modes (Mixtures.cpp:278-372:
hard best-density vs normalized exp(-score) soft posteriors with the
1e-8 cutoff; scoring via sum_score -log Σ exp(-d), Mixtures.cpp:719-728).
Fixtures were produced by the rebuilt C++ oracle with the demo training
recipe and max-approx=false (tests/fixtures/sum_mode/)."""

import numpy as np
import pytest

from speechrecognition_tpu.io import read_alignment, read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.tdp import TdpModel
from speechrecognition_tpu.train.em import Trainer, TrainerConfig

TDP = dict(loop=20.0, forward=0.0, skip=20.0)

# oracle sum-mode trajectory (am_scores.data, %g 6 significant digits)
ORACLE_SUM_AM_SCORES = {
    (-1, 0, 0): 32.9885,
    (0, 0, 0): 32.5804,
    (1, -1, 0): 32.0199,
    (1, 0, 0): 31.8052, (1, 0, 1): 31.7698, (1, 0, 2): 31.7469,
    (2, -1, 0): 31.212,
    (2, 0, 0): 31.105, (2, 0, 1): 31.0495, (2, 0, 2): 31.0119,
}


@pytest.fixture(scope="module")
def trained_sum(lexicon, demo_corpus, tmp_path_factory):
    import jax.numpy as jnp
    out = tmp_path_factory.mktemp("em_sum")
    model = MixtureModel(dim=25, num_mixtures=lexicon.num_states,
                         var_model=VarianceModel.MIXTURE_POOLING,
                         max_approx=False)
    tdp = TdpModel(silence_state=lexicon.silence_state, **TDP)
    cfg = TrainerConfig(min_obs=1, num_splits=2, num_aligns=1, num_estimates=3,
                        pruning_threshold=120.0,
                        mixture_path=str(out) + "/iter-",
                        alignment_path=str(out) + "/alignment-")
    trainer = Trainer(cfg, lexicon, model, tdp, max_approx=False,
                      dtype=jnp.float64, log=lambda *a: None)
    alignment = trainer.train(demo_corpus)
    return trainer, alignment, out


def test_sum_mode_am_score_trajectory(trained_sum):
    trainer, _, _ = trained_sum
    got = {}
    for line in trainer.stats_lines:
        i, j, k, s = line.split()
        got[(int(i), int(j), int(k))] = float(s)
    assert set(got) == set(ORACLE_SUM_AM_SCORES)
    for key, ref in ORACLE_SUM_AM_SCORES.items():
        assert abs(got[key] - ref) < 1e-3, (key, got[key], ref)


def test_sum_mode_final_alignment_matches_oracle(trained_sum, fixtures_dir):
    _, _, out = trained_sum
    ref_states, _, _ = read_alignment(
        str(fixtures_dir / "sum_mode" / "alignment-2-0.dump"))
    mine, _, _ = read_alignment(str(out / "alignment-2-0.dump"))
    assert mine.shape == ref_states.shape
    np.testing.assert_array_equal(mine, ref_states)


def test_sum_mode_accumulators_close(trained_sum, fixtures_dir):
    _, _, out = trained_sum
    for name in ("iter-lin.mix", "iter-2.mix"):
        ref = read_mixture_set(str(fixtures_dir / "sum_mode" / name), 25)
        mine = read_mixture_set(str(out / name), 25)
        assert [len(m) for m in mine.mixtures] == [len(m) for m in ref.mixtures]
        np.testing.assert_allclose(mine.mean_weight, ref.mean_weight,
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(mine.mean_acc, ref.mean_acc,
                                   rtol=1e-6, atol=1e-5)
