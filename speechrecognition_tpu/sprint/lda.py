"""LDA front-end: Sprint XML matrix reader + sliding-window projection.

The Sprint recognition front-end concatenates a sliding window of base
features (e.g. 9×16 MFCC) and projects with an LDA matrix
(Signal/ScatterTransform, applied via the cache.lda.flow network with
``lda-window.max-size``/``right`` parameters). Here the whole corpus
transform is one batched matmul.
"""

from __future__ import annotations

import gzip
import re
from typing import Tuple

import numpy as np


def read_matrix_xml(path: str) -> np.ndarray:
    """Parse Sprint's <matrix-f32 nRows=... nColumns=...> text format."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="latin-1") as f:
        text = f.read()
    m = re.search(r'<matrix-f32\s+nRows="(\d+)"\s+nColumns="(\d+)"\s*>', text)
    if not m:
        raise ValueError(f"{path}: no matrix-f32 element")
    rows, cols = int(m.group(1)), int(m.group(2))
    body = text[m.end(): text.find("</matrix-f32>")]
    vals = np.array(body.split(), dtype=np.float64)
    if vals.size != rows * cols:
        raise ValueError(f"{path}: expected {rows*cols} values, got {vals.size}")
    return vals.reshape(rows, cols)


class SlidingWindowLDA:
    """window of (max_size) frames with (right) future frames, flattened in
    temporal order and projected: out[t] = A · concat(x[t-left..t+right]).

    Edge frames repeat the boundary frame (Sprint's signal window node
    default behaviour)."""

    def __init__(self, matrix: np.ndarray, max_size: int, right: int):
        self.matrix = matrix.astype(np.float32)
        self.max_size = max_size
        self.right = right
        self.left = max_size - 1 - right

    @property
    def input_dim(self) -> int:
        return self.matrix.shape[1] // self.max_size

    @property
    def output_dim(self) -> int:
        return self.matrix.shape[0]

    def __call__(self, feats: np.ndarray) -> np.ndarray:
        """f32 [T, base_dim] → f32 [T, output_dim]."""
        T, D = feats.shape
        if D * self.max_size != self.matrix.shape[1]:
            raise ValueError(f"feature dim {D} × window {self.max_size} != "
                             f"matrix cols {self.matrix.shape[1]}")
        idx = np.clip(np.arange(T)[:, None]
                      + np.arange(-self.left, self.right + 1)[None, :], 0, T - 1)
        window = feats[idx].reshape(T, self.max_size * D)
        return window @ self.matrix.T
