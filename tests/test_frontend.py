"""Front-end parity vs oracle-generated fixtures (bit-exact)."""

import glob
import os

import numpy as np
import pytest

from speechrecognition_tpu.features import (
    SignalAnalysisConfig, extract_features, extract_features_batch_jax,
    add_deltas, process_features)
from speechrecognition_tpu.io import (
    read_audio_file, read_feature_file, read_normalization)

AUDIO = "/root/reference/data/audio"


def _demo_files(fixtures_dir):
    return sorted(glob.glob(str(fixtures_dir / "demo_features" / "*.mm2")))


def test_extraction_bit_parity(fixtures_dir):
    cfg = SignalAnalysisConfig()
    for f in _demo_files(fixtures_dir)[:8]:
        name = os.path.basename(f)[:-4]
        audio = read_audio_file(f"{AUDIO}/{name}.sph")
        mine = extract_features(audio, cfg)
        ref = read_feature_file(f).reshape(-1, 12)
        np.testing.assert_array_equal(mine, ref)


def test_extraction_jax_batch_close(fixtures_dir):
    """The batched device path (f64 matmul-DFT) must agree with the oracle
    .mm2 content to float32 rounding."""
    import jax.numpy as jnp
    cfg = SignalAnalysisConfig()
    files = _demo_files(fixtures_dir)[:4]
    audios = [read_audio_file(f"{AUDIO}/{os.path.basename(f)[:-4]}.sph") for f in files]
    S = max(len(a) for a in audios)
    batch = np.zeros((len(audios), S), np.int16)
    lens = np.array([len(a) for a in audios])
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    out = np.asarray(extract_features_batch_jax(jnp.asarray(batch), jnp.asarray(lens), cfg))
    for i, f in enumerate(files):
        ref = read_feature_file(f).reshape(-1, 12)
        T = ref.shape[0]
        got = out[i, :T].astype(np.float32)
        assert np.max(np.abs(got - ref) / (1.0 + np.abs(ref))) < 1e-6


def test_normalization_roundtrip(fixtures_dir, tmp_path):
    from speechrecognition_tpu.io import write_normalization
    mean, std = read_normalization(str(fixtures_dir / "normalization-demo.bin"), 25)
    assert mean.shape == (25,) and std.shape == (25,)
    write_normalization(str(tmp_path / "n.bin"), mean, std)
    m2, s2 = read_normalization(str(tmp_path / "n.bin"), 25)
    np.testing.assert_array_equal(mean, m2)
    np.testing.assert_array_equal(std, s2)


def test_normalization_stats_match_oracle(fixtures_dir):
    """Recompute corpus mean/σ from the raw cepstra + deltas and compare to
    the oracle's normalization file (same double accumulation)."""
    from speechrecognition_tpu.features.frontend import compute_normalization_stats
    cfg = SignalAnalysisConfig()
    rows = []
    for f in _demo_files(fixtures_dir):
        f12 = read_feature_file(f).reshape(-1, 12)
        rows.append(add_deltas(f12, cfg))
    mean, std = compute_normalization_stats(np.concatenate(rows, axis=0))
    ref_mean, ref_std = read_normalization(str(fixtures_dir / "normalization-demo.bin"), 25)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(std, ref_std, rtol=1e-12, atol=1e-12)


def test_process_features_shapes(demo_corpus):
    assert demo_corpus.dim == 25
    assert demo_corpus.num_segments == 35
    assert demo_corpus.total_frames > 0
    # energy-max-norm: per-utterance max of column 0 must be exactly 0
    for s in range(demo_corpus.num_segments):
        seq = demo_corpus.feature_sequence(s)
        assert seq[:, 0].max() == 0.0
