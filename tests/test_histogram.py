"""Histogram pruning (Search/Histogram.hh, acoustic histogram pruning in
Search/WordConditionedTreeSearch.cc:1256-1264).

Invariants:
  * the jitted quantile matches a direct python port of Histogram::quantile
    on random score sets (same binning, same walk semantics);
  * pruning keeps all hypotheses whenever count <= limit and otherwise
    keeps at least `limit` but never more than the quantile bin allows;
  * the WCTS decoder with a generous state limit reproduces its
    unlimited transcripts exactly, and a tight limit still decodes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.io import read_mixture_set
from speechrecognition_tpu.models.gmm import MixtureModel, VarianceModel
from speechrecognition_tpu.search.histogram import (histogram_prune,
                                                    histogram_quantile)
from speechrecognition_tpu.search.tree_decoder import TreeTables
from speechrecognition_tpu.search.wcts import decode_batch_wcts
from speechrecognition_tpu.tdp import TdpModel


def reference_quantile(scores, lower, upper, nn, bins):
    """Direct port of Histogram::bin/quantile (Search/Histogram.hh:32-74)."""
    scale = (bins - 1) / (upper - lower)
    counts = [0] * bins
    for s in scores:
        b = int((s - lower) * scale)
        counts[min(b, bins - 1)] += 1
    n = nn
    b = 0
    while b < bins:
        n -= counts[b]
        if n <= 0:
            break
        b += 1
    return b / scale + lower


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("bins", [16, 101])
def test_quantile_matches_reference(seed, bins):
    rng = np.random.RandomState(seed)
    n = 500
    scores = rng.uniform(0.0, 50.0, size=n)
    lower, upper = 0.0, 50.0
    for limit in (1, 10, 100, 499, 500, 600):
        got = float(histogram_quantile(
            jnp.asarray(scores), jnp.ones(n, bool), lower, upper, limit, bins))
        want = reference_quantile(scores, lower, upper, limit, bins)
        assert got == pytest.approx(want, rel=1e-6), (limit, got, want)


def test_quantile_ignores_invalid():
    scores = jnp.asarray([0.0, 1.0, 2.0, 100.0, 100.0])
    valid = jnp.asarray([True, True, True, False, False])
    thr = float(histogram_quantile(scores, valid, 0.0, 3.0, 2, 31))
    assert 1.0 <= thr < 2.0  # second-best falls in bin of score 1


def test_prune_counts():
    rng = np.random.RandomState(5)
    scores = jnp.asarray(rng.uniform(0.0, 20.0, size=1000))
    valid = jnp.ones(1000, bool)
    # limit above count: nothing pruned, threshold = beam edge
    keep, thr = histogram_prune(scores, valid, 2000, 0.0, 20.0, bins=101)
    assert bool(keep.all()) and float(thr) == 20.0
    # tight limit: at least `limit` survive, far fewer than before
    keep, thr = histogram_prune(scores, valid, 100, 0.0, 20.0, bins=101)
    kept = int(keep.sum())
    # the quantile is the limit bin's LOWER edge (Histogram.hh:71), so the
    # kept count lands within one bin's population of the limit
    assert 80 <= kept <= 120, kept
    assert bool((jnp.asarray(scores)[np.asarray(keep)] <= float(thr)).all())


def test_wcts_histogram_pruning(lexicon, fixtures_dir, demo_corpus,
                                demo_recognition):
    raw = read_mixture_set(str(fixtures_dir / "iter-2.mix"), 25)
    model = MixtureModel.from_raw(raw, VarianceModel.MIXTURE_POOLING,
                                  max_approx=True)
    pack = model.pack(dtype=jnp.float64)
    c = demo_recognition["config"]
    tdp = TdpModel(silence_state=lexicon.silence_state,
                   loop=c["tdp"][0], forward=c["tdp"][1], skip=c["tdp"][2])
    W = lexicon.num_words
    lm = np.full((W, W), c["word_penalty"])
    lm[:, lexicon.silence_idx] = 0.0
    lm_start = lm[0].copy()
    tables = TreeTables.build(lexicon, tdp, word_penalty=0.0)
    feats, lens = demo_corpus.padded_batch(list(range(10)))

    base = decode_batch_wcts(pack, feats, lens, tables, tdp, lm, lm_start,
                             c["am_threshold"], lexicon.silence_idx,
                             dtype=jnp.float64)
    # generous limit (full search space fits) → identical transcripts
    wide = decode_batch_wcts(pack, feats, lens, tables, tdp, lm, lm_start,
                             c["am_threshold"], lexicon.silence_idx,
                             state_limit=10 ** 6, dtype=jnp.float64)
    assert wide == base
    # tight limit still yields mostly-correct digit strings
    tight = decode_batch_wcts(pack, feats, lens, tables, tdp, lm, lm_start,
                              c["am_threshold"], lexicon.silence_idx,
                              state_limit=48, dtype=jnp.float64)
    assert sum(t == b for t, b in zip(tight, base)) >= 8
