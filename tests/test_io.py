import numpy as np

from speechrecognition_tpu.io import (
    read_alignment, read_mixture_set, write_alignment, write_mixture_set)


def test_mixture_set_roundtrip(fixtures_dir, tmp_path):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    assert len(raw.mixtures) == 106
    assert raw.dim == 25
    out = tmp_path / "roundtrip.mix"
    write_mixture_set(str(out), raw)
    with open(fixtures_dir / "iter-2.mix", "rb") as a, open(out, "rb") as b:
        assert a.read() == b.read()


def test_alignment_roundtrip(fixtures_dir, tmp_path):
    states, weights, max_aligns = read_alignment(
        str(fixtures_dir / "demo_alignments" / "alignment-2-0.dump"))
    assert max_aligns == 1
    assert states.min() >= 0 and states.max() < 106
    out = tmp_path / "a.dump"
    write_alignment(str(out), states, weights, max_aligns)
    with open(fixtures_dir / "demo_alignments" / "alignment-2-0.dump", "rb") as a, \
         open(out, "rb") as b:
        assert a.read() == b.read()


def test_model_from_raw_roundtrip(fixtures_dir, tmp_path):
    """load .mix → MixtureModel → write .mix must be byte-identical."""
    from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING, max_approx=True)
    assert model.num_densities() == sum(len(m) for m in raw.mixtures)
    write_mixture_set(str(tmp_path / "again.mix"), model.to_raw())
    with open(fixtures_dir / "iter-2.mix", "rb") as a, \
         open(tmp_path / "again.mix", "rb") as b:
        assert a.read() == b.read()
