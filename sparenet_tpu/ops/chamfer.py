"""Chamfer distance: bidirectional nearest-neighbor squared distances.

TPU-native equivalent of the reference CUDA extensions
``cuda/chamfer_dist`` (cuda/chamfer_dist/chamfer.cu:15-229) and
``cuda/chamfer_distance`` (cuda/chamfer_distance/chamfer_distance.cu).
Both reference copies implement the same op; this module provides the one
implementation plus the module-level aliases both reference wrappers
exposed (cuda/chamfer_dist/__init__.py:6-52,
cuda/chamfer_distance/chamfer_distance.py:64-72).

Design (TPU-first):
  - the NN search is a chunked pairwise-distance reduction: each [chunk, M]
    distance tile comes from one MXU matmul and is min-reduced before the
    next tile is formed, so the full [N, M] matrix is never materialized.
  - distances are recomputed exactly as sum((x - y[idx])^2) after the
    argmin so reported values match the reference's direct formula
    (chamfer.cu:103) without |.|^2 expansion cancellation error.
  - the VJP is custom, mirroring ChamferDistanceGradKernel
    (chamfer_distance.cu:159-204): for every point of cloud 1,
    grad flows both to it and (negated) to its matched point of cloud 2,
    and symmetrically — realized as a gather plus a scatter-add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import pairwise_sqdist, pick_chunk

__all__ = [
    "chamfer_raw",
    "chamfer_distance",
    "chamfer_distance_mean",
    "chamfer_distance_separate",
    "nn_search",
]


def _nn_one(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor of each row of x [N,3] in y [M,3] -> (sqdist [N], idx [N])."""
    n, m = x.shape[0], y.shape[0]
    chunk = pick_chunk(n, m)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    tiles = xp.reshape(-1, chunk, x.shape[1])

    def body(tile):
        d = pairwise_sqdist(tile, y)
        return jnp.argmin(d, axis=-1)

    idx = jax.lax.map(body, tiles) if tiles.shape[0] > 1 else body(tiles[0])[None]
    idx = idx.reshape(-1)[:n].astype(jnp.int32)
    diff = x - y[idx]
    dist = jnp.sum(diff * diff, axis=-1)
    return dist, idx


def _nn_batched(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NN with dispatch: VMEM-resident Pallas kernel on TPU
    (ops/pallas/chamfer_pallas.py), chunked XLA elsewhere. Distances are
    recomputed from the gathered match identically on both paths."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and x.shape[1] >= 512 and y.shape[1] >= 512:
        from .pallas.chamfer_pallas import nn_idx_pallas
        idx = nn_idx_pallas(x, y)
        diff = x - jnp.take_along_axis(y, idx[..., None], axis=1)
        return jnp.sum(diff * diff, axis=-1), idx
    return jax.vmap(_nn_one)(x, y)


@jax.jit
def nn_search(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched nearest-neighbor search x [B,N,3] -> y [B,M,3]."""
    return _nn_batched(x, y)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def chamfer_raw(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """(dist1 [B,N], dist2 [B,M], idx1 [B,N], idx2 [B,M]).

    Parity: ``ChamferFunction`` (cuda/chamfer_dist/__init__.py:6-19).
    """
    dist1, idx1 = _nn_batched(xyz1, xyz2)
    dist2, idx2 = _nn_batched(xyz2, xyz1)
    return dist1, dist2, idx1, idx2


def _chamfer_fwd(xyz1, xyz2):
    out = chamfer_raw(xyz1, xyz2)
    dist1, dist2, idx1, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _one_sided_grads(xyz1, xyz2, idx1, g1):
    """grads of sum(g1 * dist1) w.r.t. (xyz1, xyz2) for one direction.

    Mirrors ChamferDistanceGradKernel (chamfer_distance.cu:159-187).
    """
    matched = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)   # [B,N,3]
    contrib = 2.0 * g1[..., None] * (xyz1 - matched)               # [B,N,3]
    gx1 = contrib
    gx2 = jnp.zeros_like(xyz2).at[
        jnp.arange(xyz1.shape[0])[:, None], idx1
    ].add(-contrib)
    return gx1, gx2


def _chamfer_bwd(res, cts):
    xyz1, xyz2, idx1, idx2 = res
    g1, g2, _, _ = cts
    a1, a2 = _one_sided_grads(xyz1, xyz2, idx1, g1)
    b2, b1 = _one_sided_grads(xyz2, xyz1, idx2, g2)
    return a1 + b1, a2 + b2


chamfer_raw.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """mean(dist1) + mean(dist2) (reference ``ChamferDistance`` /
    ``ChamferDistanceMean``, cuda/chamfer_dist/__init__.py:22-36,
    cuda/chamfer_distance/chamfer_distance.py:64-72)."""
    dist1, dist2, _, _ = chamfer_raw(xyz1, xyz2)
    return jnp.mean(dist1) + jnp.mean(dist2)


# The reference keeps two identically-behaved wrappers; keep both names.
chamfer_distance_mean = chamfer_distance


def chamfer_distance_separate(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """(mean(dist1), mean(dist2)) (reference ``ChamferDistanceSeperate``,
    cuda/chamfer_dist/__init__.py:39-52; also the `(dist1, dist2)` pair used
    by the consistency loss, runners/sparenet_runner.py:103-105)."""
    dist1, dist2, _, _ = chamfer_raw(xyz1, xyz2)
    return jnp.mean(dist1), jnp.mean(dist2)
