"""Test configuration: run JAX on CPU with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment may pre-register a TPU plugin that overrides
# JAX_PLATFORMS — force the CPU backend with 8 virtual devices so the
# multi-chip sharding paths are exercised without hardware.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the EM/decoder scans cost minutes of XLA
# compile on this 2-CPU box; re-runs of the suite hit the disk cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import json  # noqa: E402
import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES


@pytest.fixture(scope="session")
def lexicon():
    from speechrecognition_tpu.lexicon import build_sietill_lexicon
    return build_sietill_lexicon()


@pytest.fixture(scope="session")
def demo_corpus(lexicon):
    """The 35-utterance demo corpus with oracle-extracted features and
    oracle normalization stats."""
    from speechrecognition_tpu.corpus import Corpus, CorpusDescription
    from speechrecognition_tpu.features.frontend import SignalAnalysisConfig

    desc = CorpusDescription.read(
        str(REFERENCE / "src/sietill/corpora/demo_corpus.json"), lexicon)
    return Corpus.read(desc, str(FIXTURES / "demo_features") + "/",
                       SignalAnalysisConfig(),
                       normalization_path=str(FIXTURES / "normalization-demo.bin"))


@pytest.fixture(scope="session")
def demo_description(lexicon):
    from speechrecognition_tpu.corpus import CorpusDescription
    return CorpusDescription.read(
        str(REFERENCE / "src/sietill/corpora/demo_corpus.json"), lexicon)


@pytest.fixture(scope="session")
def demo_recognition():
    with open(FIXTURES / "demo_recognition.json") as f:
        return json.load(f)
