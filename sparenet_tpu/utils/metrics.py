"""Evaluation metrics: F-Score, Chamfer Distance, EMD.

Rebuild of the reference Metrics registry (utils/misc.py:133-260) with
one deliberate TPU-native change: F-Score runs as a jitted pairwise
nearest-neighbor computation on device instead of the reference's
per-sample CPU open3d hop (utils/misc.py:180-198) — same numbers, no
host round trip.

Units match the reference exactly:
  - F-Score@0.01 (higher better)
  - ChamferDistance: (mean d1 + mean d2) * 1000 (lower better)
  - EMD: mean(sqrt(dist)) * 100 at eps=0.005, iters=50 (lower better);
    final-test protocol eps=0.002, iters=10000 (utils/misc.py:206-211).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer_raw
from ..ops.emd import emd_auction

NAMES = ["F-Score", "ChamferDistance", "EMD"]
_INIT = {"F-Score": 0.0, "ChamferDistance": 32767.0, "EMD": 32767.0}
_GREATER_BETTER = {"F-Score": True, "ChamferDistance": False, "EMD": False}


@functools.partial(jax.jit, static_argnames=("th",))
def f_score(pred: jnp.ndarray, gt: jnp.ndarray, th: float = 0.01) -> jnp.ndarray:
    """Per-sample F-Score at distance threshold th (utils/misc.py:180-190);
    distances are euclidean (open3d point_cloud_distance semantics)."""
    d1, d2, _, _ = chamfer_raw(pred, gt)
    precision = jnp.mean(jnp.sqrt(d1) < th, axis=-1)
    recall = jnp.mean(jnp.sqrt(d2) < th, axis=-1)
    denom = precision + recall
    return jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)


@jax.jit
def chamfer_metric(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-sample (mean d1 + mean d2) * 1000 (utils/misc.py:201-203)."""
    d1, d2, _, _ = chamfer_raw(pred, gt)
    return (jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)) * 1000.0


@functools.partial(jax.jit, static_argnames=("eps", "iters"))
def emd_metric(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 0.005,
               iters: int = 50) -> jnp.ndarray:
    """Per-sample mean(sqrt(dist)) * 100 (utils/misc.py:206-211)."""
    dist, _ = emd_auction(pred, gt, eps, iters)
    return jnp.mean(jnp.sqrt(dist), axis=-1) * 100.0


def compute_all(pred, gt, eps: float = 0.005, iters: int = 50):
    """[F-Score, CD, EMD] per sample, as numpy [3, B]."""
    return np.stack([
        np.asarray(f_score(pred, gt)),
        np.asarray(chamfer_metric(pred, gt)),
        np.asarray(emd_metric(pred, gt, eps, iters)),
    ])


class Metrics:
    """Value container with the reference comparison protocol
    (utils/misc.py:213-260)."""

    ITEMS = NAMES

    def __init__(self, metric_name: str, values):
        self.metric_name = metric_name
        if isinstance(values, dict):
            self._values = [values.get(n, _INIT[n]) for n in NAMES]
        else:
            self._values = list(values)

    @classmethod
    def names(cls):
        return list(NAMES)

    @classmethod
    def get(cls, pred, gt):
        """Per-batch mean metric values [3] (utils/misc.py:160-168)."""
        vals = compute_all(pred, gt)
        return [float(v.mean()) for v in vals]

    def state_dict(self):
        return dict(zip(NAMES, self._values))

    def __getitem__(self, i):
        return self._values[i]

    def __repr__(self):
        return str(self.state_dict())

    def better_than(self, other) -> bool:
        if other is None:
            return True
        idx = NAMES.index(self.metric_name)
        a, b = self._values[idx], other._values[idx]
        return a > b if _GREATER_BETTER[self.metric_name] else a < b
