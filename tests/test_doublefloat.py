"""Double-float (two-f32) arithmetic: exactness vs float64 references.

The DF toolkit (ops/doublefloat.py) must track float64 to ~2^-48 relative
so the decode scan reproduces the reference's double-precision decisions
(Mixtures.cpp:590-628 accumulates scores in double).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speechrecognition_tpu.ops import doublefloat as dfm


RNG = np.random.default_rng(7)


def _rand(shape, scale=100.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float64)


def test_from_to_f64_roundtrip():
    """A DF pair carries ~49 mantissa bits: the roundtrip is within
    2^-48 relative (not bit-exact — f64 has 53 bits)."""
    x = _rand((1000,))
    d = dfm.from_f64(x)
    np.testing.assert_allclose(dfm.to_f64(d), x, rtol=2.0 ** -48)
    # normalization: |lo| <= ulp(hi)
    hi = np.asarray(d.hi, np.float64)
    lo = np.asarray(d.lo, np.float64)
    ulp = np.spacing(np.abs(hi).astype(np.float32)).astype(np.float64)
    assert np.all(np.abs(lo) <= ulp + 1e-300)


def test_two_sum_exact():
    a = _rand((1000,)).astype(np.float32)
    b = (_rand((1000,)) * 1e-5).astype(np.float32)
    s, e = dfm.two_sum(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(got, want)


def test_two_prod_exact():
    a = _rand((1000,)).astype(np.float32)
    b = _rand((1000,)).astype(np.float32)
    p, e = dfm.two_prod(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    want = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(got, want)


def test_add_chain_tracks_f64():
    """Summing 10k mixed-magnitude terms stays within 2^-45 of float64."""
    xs = _rand((10000,), scale=1.0) * np.logspace(0, 4, 10000)
    acc = dfm.df(jnp.zeros(()))
    for i in range(0, 10000, 500):
        chunk = dfm.from_f64(xs[i:i + 500].sum())  # pre-reduced sub-blocks
        acc = dfm.add(acc, chunk)
    want = sum(xs[i:i + 500].sum() for i in range(0, 10000, 500))
    got = float(dfm.to_f64(acc))
    assert abs(got - want) <= abs(want) * 2.0 ** -45


def test_mul_tracks_f64():
    a = dfm.from_f64(_rand((512,)))
    b = dfm.from_f64(_rand((512,)))
    got = dfm.to_f64(dfm.mul(a, b))
    want = dfm.to_f64(a) * dfm.to_f64(b)
    np.testing.assert_allclose(got, want, rtol=2.0 ** -45)


def test_comparisons_lexicographic():
    a64 = np.array([1.0, 1.0, 1.0 + 1e-12, 2.0, -3.0])
    b64 = np.array([1.0 + 1e-12, 1.0, 1.0, 2.0 + 1e-9, -3.0 + 1e-13])
    a, b = dfm.from_f64(a64), dfm.from_f64(b64)
    np.testing.assert_array_equal(np.asarray(dfm.less(a, b)), a64 < b64)
    np.testing.assert_array_equal(np.asarray(dfm.less_equal(a, b)), a64 <= b64)


def test_min_axis_matches_f64():
    x = _rand((7, 33, 5))
    # inject near-ties that f32 alone cannot order
    x[0, 0, 0] = 5.0
    x[0, 1, 0] = 5.0 + 1e-11
    d = dfm.from_f64(x)
    # the min over DF-rounded inputs is exact (selection never rounds)
    xr = dfm.to_f64(d).reshape(x.shape)
    for axis in (0, 1, 2, (1, 2), (0, 1, 2)):
        got = dfm.to_f64(dfm.min_axis(d, axis))
        want = xr.min(axis=axis)
        np.testing.assert_array_equal(got, want)


def test_sq_f_exact():
    x = _rand((300,)).astype(np.float32)
    got = dfm.to_f64(dfm.sq_f(jnp.asarray(x)))
    want = x.astype(np.float64) ** 2
    np.testing.assert_array_equal(got, want)
