"""k-nearest-neighbor search and DGCNN-style edge features.

TPU-native replacement for the external ``knn_cuda`` wheel and the
``knn`` / ``get_graph_feature`` helpers
(models/sparenet_generator.py:852-906). The pairwise-distance matrix is
built tile-by-tile from MXU matmuls and immediately top-k-reduced, so the
full [N, N] matrix is only materialized for small N.

Convention: channel-LAST. Point features are [B, N, C]; edge features are
[B, N, k, 2C] with the reference's channel order (x_j - x_i, x_i)
(models/sparenet_generator.py:905).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import common as _common
from .common import pairwise_sqdist_graph, pick_chunk

__all__ = ["knn_idx", "get_graph_feature"]

import os as _os

_PACKED = _os.environ.get("SPARENET_KNN_PACKED", "1") == "1"


def _smallest_k(d: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k smallest entries per row of d [N, M], ascending.

    k iterative masked argmins: ~2x faster than lax.top_k on TPU for the
    small k (8) used by the EdgeConv graphs, with the same lowest-index
    tie-breaking as the reference's topk fallback
    (models/sparenet_generator.py:871-875).
    """
    m = d.shape[-1]
    lane = jnp.arange(m)
    idxs = []
    for _ in range(k):
        i = jnp.argmin(d, axis=-1)
        idxs.append(i)
        d = jnp.where(lane[None, :] == i[:, None], jnp.inf, d)
    return jnp.stack(idxs, axis=-1)


def _knn_one(x: jnp.ndarray, y: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest rows of y [M,C] for each row of x [N,C]."""
    n, m = x.shape[0], y.shape[0]
    chunk = pick_chunk(n, m, budget_elems=1 << 24)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    tiles = xp.reshape(-1, chunk, x.shape[1])

    def body(tile):
        return _smallest_k(pairwise_sqdist_graph(tile, y), k)

    idx = jax.lax.map(body, tiles) if tiles.shape[0] > 1 else body(tiles[0])[None]
    return idx.reshape(-1, k)[:n].astype(jnp.int32)


def knn_idx(x: jnp.ndarray, k: int, impl: str = "auto") -> jnp.ndarray:
    """Self-kNN indices for x [B, N, C] -> [B, N, k] (includes self).

    On TPU a fused Pallas kernel keeps the distance tiles in VMEM
    (ops/pallas/knn_pallas.py); elsewhere the chunked XLA path runs.
    """
    if impl == "auto":
        n, c = x.shape[1], x.shape[2]
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = "pallas" if (on_tpu and n <= 16384 and c <= 1024) else "xla"
    if impl == "pallas":
        from .pallas.knn_pallas import knn_self_pallas
        # serving mode: packed-key selection (~11-mantissa-bit distance
        # ranking, lowest-index ties) halves the per-k selection passes.
        # SPARENET_KNN_PACKED=0 keeps exact selection under fast math
        # (serving-envelope ablations, scripts/r3/serving_envelope.py).
        return knn_self_pallas(x, k, packed=_common.FAST_MATH and _PACKED)
    return jax.vmap(lambda p: _knn_one(p, p, k))(x)


def get_graph_feature(x: jnp.ndarray, k: int = 20, idx: jnp.ndarray | None = None) -> jnp.ndarray:
    """Edge features [B, N, k, 2C]: concat(x_j - x_i, x_i).

    Parity: models/sparenet_generator.py:880-906 (which emits the
    channel-first [B, 2C, N, k] layout; this is its channel-last analog).
    """
    if idx is None:
        idx = knn_idx(x, k=k)
    neighbors = jnp.take_along_axis(
        x[:, :, None, :], idx[..., None], axis=1
    )  # [B, N, k, C]
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([neighbors - center, center], axis=-1)
