"""GriddingDistance / GriddingLoss: multi-scale voxelized L1 distance.

TPU-native equivalent of ``cuda/gridding_loss``
(gridding_distance.cu:29-120, cuda/gridding_loss/__init__.py:13-122).

The reference rasterizes both clouds onto a per-corner-slot grid
(vertex_index * 8 + corner_slot) spanning the dynamic joint bounding box
of pred and gt, then takes ``alpha * L1Loss(pred_grid, gt_grid)`` per
scale. Under jit we need static shapes, so the scatter target is a static
grid spanning [-s/2 - 2, s/2 + 2] per axis (the largest bbox reachable for
clouds in [-1, 1], since the reference pads the bbox by one on each side).
Vertices outside the dynamic bbox receive no mass from either cloud, so
the |pred - gt| sum over the static grid equals the reference sum; the
L1 *mean* divides by the dynamically-computed vertex count of the
reference grid for exact parity.

Note: the reference configures this loss (configs/base_config.py:38-39)
but no runner consumes it (grnet_runner.py:80-90 uses chamfer/EMD only).
Ported for completeness; also usable as an extra training signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gridding import trilinear_corners

__all__ = ["gridding_distance", "gridding_loss", "GriddingLoss"]


def _rasterize_slots(p: jnp.ndarray, lo: int, length: int) -> jnp.ndarray:
    """Scatter one cloud [N, 3] (grid units) onto a [length^3, 8] slot grid."""
    valid = jnp.sum(p, axis=-1) != 0.0
    corner_xyz, weights = trilinear_corners(p)        # [N,8,3], [N,8]
    weights = weights * valid[:, None]
    offs = corner_xyz - lo                            # [N, 8, 3]
    flat = (offs[..., 0] * length + offs[..., 1]) * length + offs[..., 2]
    in_range = jnp.all((offs >= 0) & (offs < length), axis=-1)
    slot = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), flat.shape)
    grid = jnp.zeros((length * length * length, 8), dtype=p.dtype)
    flat = jnp.where(in_range, flat, length**3)       # OOB -> dropped row
    return grid.at[flat, slot].add(weights, mode="drop")


def gridding_distance(pred_cloud: jnp.ndarray, gt_cloud: jnp.ndarray, scale: int):
    """Returns (pred_grid, gt_grid, n_reference_vertices).

    Grids are [B, L^3, 8] on the static bbox with L = scale + 5;
    ``n_reference_vertices`` is the traced vertex count of the reference's
    dynamic grid (gridding_distance wrapper, cuda/gridding_loss/__init__.py:60-91).
    """
    half = scale / 2.0
    p = pred_cloud * half
    g = gt_cloud * half
    lo = -(scale // 2) - 2
    length = scale + 5                                # covers [lo, s/2 + 2]

    pred_grid = jax.vmap(lambda c: _rasterize_slots(c, lo, length))(p)
    gt_grid = jax.vmap(lambda c: _rasterize_slots(c, lo, length))(g)

    # dynamic vertex count of the reference grid: per axis
    # len = (ceil(max)+1) - (floor(min)-1) + 1 over the union of both clouds
    both = jnp.concatenate([p, g], axis=1)
    mn = jnp.floor(jnp.min(both.reshape(-1, 3), axis=0)) - 1.0
    mx = jnp.ceil(jnp.max(both.reshape(-1, 3), axis=0)) + 1.0
    lens = mx - mn + 1.0
    n_vertices = lens[0] * lens[1] * lens[2]
    return pred_grid, gt_grid, n_vertices


def gridding_loss(pred_cloud, gt_cloud, scales, alphas):
    """sum_i alpha_i * L1(pred_grid_i, gt_grid_i)
    (reference ``GriddingLoss``, cuda/gridding_loss/__init__.py:100-122)."""
    total = 0.0
    for scale, alpha in zip(scales, alphas):
        pred_grid, gt_grid, n_vertices = gridding_distance(pred_cloud, gt_cloud, scale)
        batch = pred_grid.shape[0]
        l1_sum = jnp.sum(jnp.abs(pred_grid - gt_grid))
        total = total + alpha * l1_sum / (batch * n_vertices * 8.0)
    return total


class GriddingLoss:
    """Configured-callable form matching the reference module interface."""

    def __init__(self, scales=(), alphas=()):
        self.scales = tuple(scales)
        self.alphas = tuple(alphas)

    def __call__(self, pred_cloud, gt_cloud):
        return gridding_loss(pred_cloud, gt_cloud, self.scales, self.alphas)
