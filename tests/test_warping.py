"""VTLN warping: piecewise-linear functions, warped filterbanks, ML factor
estimation (reference: Math/PiecewiseLinearFunction.cc,
Math/AnalyticFunctionFactory.cc:421-510, Signal/Filterbank.hh:30-38)."""

import numpy as np
import pytest

from speechrecognition_tpu.features.frontend import (
    SignalAnalysisConfig, mel_filterbank_matrix)
from speechrecognition_tpu.features.warping import (
    MaximumLikelihoodWarpingEstimator, PiecewiseLinear, extract_features_warped,
    three_piece_affine, two_piece_linear, vtln_filterbank_stack,
    warped_mel_filterbank_matrix)

MAX_F = 4000.0


@pytest.mark.parametrize("alpha", [0.8, 0.9, 1.0, 1.1, 1.25])
def test_two_piece_linear_fixed_point_and_monotone(alpha):
    f = two_piece_linear(alpha, 0.875, MAX_F)
    assert f.value(0.0) == pytest.approx(0.0)
    assert f.value(MAX_F) == pytest.approx(MAX_F, abs=1e-9)
    x = np.linspace(0.0, MAX_F, 2001)
    y = f.value(x)
    assert np.all(np.diff(y) > 0), "warping must be strictly increasing"
    # slope α in the linear region
    assert f.value(100.0) == pytest.approx(alpha * 100.0, rel=1e-12)


def test_two_piece_linear_continuity_at_knee():
    f = two_piece_linear(0.9, 0.875, MAX_F)
    knee = 0.875 * MAX_F
    eps = 1e-6
    assert f.value(knee - eps) == pytest.approx(f.value(knee + eps), abs=1e-3)


@pytest.mark.parametrize("alpha", [0.85, 1.0, 1.15])
def test_invert_roundtrip(alpha):
    f = two_piece_linear(alpha, 0.875, MAX_F)
    finv = f.invert()
    x = np.linspace(0.0, MAX_F, 101)
    np.testing.assert_allclose(finv.value(f.value(x)), x, atol=1e-8)


def test_alpha_gt_one_is_inverse_construction():
    # α>1 is built as invert(build(1/α)) (AnalyticFunctionFactory.cc:430-438)
    f = two_piece_linear(1.2, 0.875, MAX_F)
    g = two_piece_linear(1.0 / 1.2, 0.875, MAX_F)
    x = np.linspace(0.0, MAX_F, 101)
    np.testing.assert_allclose(g.value(f.value(x)), x, atol=1e-8)


@pytest.mark.parametrize("alpha", [0.9, 1.0, 1.1])
def test_three_piece_affine(alpha):
    f = three_piece_affine(alpha, 200.0, 0.1, 0.8, MAX_F)
    assert f.value(MAX_F) == pytest.approx(MAX_F, abs=1e-6)
    x = np.linspace(1.0, MAX_F, 1001)
    assert np.all(np.diff(f.value(x)) > 0)
    # middle region has slope α
    mid = 0.5 * MAX_F
    assert f.derivative(mid) == pytest.approx(
        alpha if alpha <= 1.0 else alpha, rel=1e-9)


def test_identity_warp_matches_mel_filterbank():
    cfg = SignalAnalysisConfig()
    base = mel_filterbank_matrix(cfg)
    warped = warped_mel_filterbank_matrix(
        cfg, two_piece_linear(1.0, 0.875, float(cfg.sample_rate // 2)))
    np.testing.assert_array_equal(base, warped)
    ident = warped_mel_filterbank_matrix(cfg, None)
    np.testing.assert_array_equal(base, ident)


def test_filterbank_stack_shape_and_energy():
    cfg = SignalAnalysisConfig()
    alphas = [0.9, 1.0, 1.1]
    stack = vtln_filterbank_stack(cfg, alphas)
    assert stack.shape == (3, cfg.dft_length // 2 + 1, cfg.n_mel_filters)
    # every filter keeps positive mass under every warp
    assert (stack.sum(axis=1) > 0).all()


def test_ml_estimator_recovers_true_alpha():
    cfg = SignalAnalysisConfig()
    rng = np.random.RandomState(7)
    t = np.arange(cfg.sample_rate * 2) / cfg.sample_rate  # 2 s of audio
    audio = (3000 * np.sin(2 * np.pi * 700 * t)
             + 2000 * np.sin(2 * np.pi * 1500 * t)
             + 300 * rng.randn(t.size)).astype(np.int16)

    alphas = [0.9, 0.95, 1.0, 1.05, 1.1]
    est = MaximumLikelihoodWarpingEstimator(cfg, alphas=alphas)
    true_alpha = 1.05
    fb_true = est.filterbanks[alphas.index(true_alpha)]
    target = extract_features_warped(audio, cfg, fb_true)
    mu, var = target.mean(axis=0), target.var(axis=0) + 1e-3

    def scorer(feats):  # diagonal-Gaussian -log likelihood to the target model
        return float(0.5 * (((feats - mu) ** 2) / var).sum())

    choice = est.estimate([audio], scorer)
    assert choice.alpha == true_alpha
    assert set(choice.scores) == set(alphas)


def test_parse_warping_function_grammar():
    from speechrecognition_tpu.features.warping import (mel_scale,
                                                        parse_warping_function)
    f = parse_warping_function("mel", MAX_F)
    np.testing.assert_allclose(f(700.0), mel_scale(700.0))

    g = parse_warping_function("linear-2(0.9, 0.875)", MAX_F)
    assert g(100.0) == pytest.approx(90.0)

    # the canonical VTLN declaration from the filterbank docs
    # (Signal/Filterbank.hh:132): warp then mel
    h = parse_warping_function(
        "nest(linear-2($input(warping-factor), 0.875), mel)", MAX_F,
        env={"warping-factor": 0.9})
    np.testing.assert_allclose(h(100.0), mel_scale(90.0))

    a = parse_warping_function("affine-3(1.1, 200, 0.1, 0.8)", MAX_F)
    assert a(MAX_F) == pytest.approx(MAX_F, abs=1e-6)

    with pytest.raises(ValueError):
        parse_warping_function("bogus(1)", MAX_F)
