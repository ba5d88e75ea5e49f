"""Semirings for weighted automata (reference: Fsa/Semiring.hh,
Fsa/tSemiring.hh — tropical and log semirings are the two the toolkit
instantiates for ASR lattices)."""

from __future__ import annotations

import numpy as np


class Semiring:
    """Abstract (⊕, ⊗, 0̄, 1̄). Weights are plain floats (−log scores)."""

    zero: float
    one: float = 0.0

    @staticmethod
    def plus(a: float, b: float) -> float:
        raise NotImplementedError

    @staticmethod
    def times(a: float, b: float) -> float:
        return a + b

    @classmethod
    def sum(cls, weights) -> float:
        acc = cls.zero
        for w in weights:
            acc = cls.plus(acc, w)
        return acc


class TropicalSemiring(Semiring):
    """min/+ — Viterbi scores (Fsa::TropicalSemiring)."""

    zero = float("inf")

    @staticmethod
    def plus(a: float, b: float) -> float:
        return a if a <= b else b


class LogSemiring(Semiring):
    """−logsumexp/+ — posterior sums (Fsa::LogSemiring)."""

    zero = float("inf")

    @staticmethod
    def plus(a: float, b: float) -> float:
        if a == float("inf"):
            return b
        if b == float("inf"):
            return a
        m = min(a, b)
        return m - np.log1p(np.exp(m - max(a, b)))


TROPICAL = TropicalSemiring
LOG = LogSemiring
