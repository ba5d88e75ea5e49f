"""df32 (double-float) EM training parity on the demo corpus.

The double-float path (ops/doublefloat.py) must reproduce the f64
trainer's decisions and statistics: same oracle AM-score trajectory, the
same final alignment, and accumulators within the oracle tolerance —
while never materializing an emulated float64 op on device. Oracle
fixtures are the C++ trainer's outputs (see test_em_demo.py).
"""

import numpy as np
import pytest

from speechrecognition_tpu.io import read_alignment, read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.tdp import TdpModel
from speechrecognition_tpu.train.em import Trainer, TrainerConfig

from test_em_demo import ORACLE_AM_SCORES, TDP


@pytest.fixture(scope="module")
def trained_df32(lexicon, demo_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("em_df32")
    model = MixtureModel(dim=25, num_mixtures=lexicon.num_states,
                         var_model=VarianceModel.MIXTURE_POOLING,
                         max_approx=True)
    tdp = TdpModel(silence_state=lexicon.silence_state, **TDP)
    cfg = TrainerConfig(min_obs=1, num_splits=2, num_aligns=1, num_estimates=3,
                        pruning_threshold=120.0,
                        mixture_path=str(out) + "/iter-",
                        alignment_path=str(out) + "/alignment-")
    trainer = Trainer(cfg, lexicon, model, tdp, max_approx=True,
                      dtype="df32", log=lambda *a: None)
    alignment = trainer.train(demo_corpus)
    return trainer, alignment, out


def test_df32_am_score_trajectory(trained_df32):
    trainer, _, _ = trained_df32
    got = {}
    for line in trainer.stats_lines:
        i, j, k, s = line.split()
        got[(int(i), int(j), int(k))] = float(s)
    assert set(got) == set(ORACLE_AM_SCORES)
    for key, ref in ORACLE_AM_SCORES.items():
        assert abs(got[key] - ref) < 1e-4, (key, got[key], ref)


def test_df32_final_alignment_matches_oracle(trained_df32, fixtures_dir):
    _, alignment, out = trained_df32
    ref_states, _, _ = read_alignment(
        str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"))
    mine, _, _ = read_alignment(str(out / "alignment-2-0.dump"))
    assert mine.shape == ref_states.shape
    np.testing.assert_array_equal(mine, ref_states)


def test_df32_accumulators_close(trained_df32, fixtures_dir):
    _, _, out = trained_df32
    for name in ("iter-lin.mix", "iter-2.mix"):
        ref = read_mixture_set(str(fixtures_dir / name), 25)
        mine = read_mixture_set(str(out / name), 25)
        assert [len(m) for m in mine.mixtures] == [len(m) for m in ref.mixtures]
        np.testing.assert_array_equal(mine.mean_weight, ref.mean_weight)
        np.testing.assert_allclose(mine.mean_acc, ref.mean_acc,
                                   rtol=1e-9, atol=1e-7)
