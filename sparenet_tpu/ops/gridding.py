"""Gridding / GriddingReverse: trilinear point-cloud <-> voxel-grid transforms.

TPU-native equivalent of ``cuda/gridding`` (gridding.cu:29-179,
gridding_reverse.cu:30-103, cuda/gridding/__init__.py:13-75).

Design: scatter-add over the 8 trilinear corners per point. XLA lowers the
segment-style scatter deterministically (no atomics needed — the CUDA
version hand-rolls atomicAdd). The op is differentiable by construction:
corner indices are integer (stop-gradient), corner weights
``prod(1 - |p - corner|)`` carry the gradient, which reproduces the
reference's analytic backward (gridding.cu backward kernel).

Grid layout: x-major flattening ``idx = x * s^2 + y * s + z`` exactly as
``compute_index`` (gridding.cu:22-25); reshape to [s, s, s] gives axes
(x, y, z).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gridding", "gridding_reverse", "trilinear_corners"]


def trilinear_corners(p: jnp.ndarray):
    """Corner offsets and weights for points p [N, 3].

    Returns (corner_xyz [N, 8, 3] int32, weights [N, 8] float).
    Corner enumeration order is LLL, LLU, LUL, LUU, ULL, ULU, UUL, UUU —
    matching gridding.cu:76-135. ``upper = floor + 1`` always (the CUDA
    code bumps ``ceil`` by one when the coordinate is integral,
    gridding.cu:55-67, which is the same thing).
    """
    lower = jnp.floor(p)                      # [N, 3]
    lower_i = jax.lax.stop_gradient(lower).astype(jnp.int32)
    # per-axis weights for (lower, upper) corners; grad flows through p
    w_low = 1.0 - jnp.abs(p - jax.lax.stop_gradient(lower))          # [N, 3]
    w_up = 1.0 - jnp.abs(p - jax.lax.stop_gradient(lower) - 1.0)     # [N, 3]

    # build the 8 combinations; bit b of corner c selects upper on that axis
    combos = jnp.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=jnp.int32
    )  # [8, 3]
    corner_xyz = lower_i[:, None, :] + combos[None, :, :]             # [N, 8, 3]
    w_axes = jnp.where(combos[None, :, :] == 0, w_low[:, None, :], w_up[:, None, :])
    weights = jnp.prod(w_axes, axis=-1)                               # [N, 8]
    return corner_xyz, weights


def _gridding_one(p: jnp.ndarray, scale: int) -> jnp.ndarray:
    """One cloud p [N, 3] (already scaled to grid units) -> grid [s, s, s]."""
    half = scale // 2
    # zero-padding rows contribute nothing (reference filters them out,
    # cuda/gridding/__init__.py:44-46)
    valid = jnp.sum(p, axis=-1) != 0.0
    corner_xyz, weights = trilinear_corners(p)
    weights = weights * valid[:, None]
    offs = corner_xyz + half                                          # [N, 8, 3]
    grid = jnp.zeros((scale, scale, scale), dtype=p.dtype)
    grid = grid.at[offs[..., 0], offs[..., 1], offs[..., 2]].add(
        weights, mode="drop"
    )
    return grid


def gridding(ptcloud: jnp.ndarray, scale: int = 64) -> jnp.ndarray:
    """Rasterize clouds [B, N, 3] (coords in [-1, 1]) -> grids [B, s, s, s].

    Parity: ``Gridding`` module (cuda/gridding/__init__.py:36-50): scales the
    cloud by s/2 and scatters onto integer vertices in [-s/2, s/2 - 1].
    """
    half = scale // 2
    return jax.vmap(lambda p: _gridding_one(p * half, scale))(ptcloud)


def gridding_reverse(grid: jnp.ndarray, scale: int = 64) -> jnp.ndarray:
    """Voxel grids [B, s, s, s] -> clouds [B, s^3, 3] in [-1, 1].

    Parity: ``GriddingReverse`` (cuda/gridding/__init__.py:53-75,
    gridding_reverse.cu:30-103): each voxel j = (x, y, z) with all offsets
    > 0 emits the weighted centroid of its 8 lower-corner cell vertices,
    normalized by the weight sum (zero if the sum < 1e-6); finally scaled
    by 2/s.
    """
    eps = 1e-6
    s = scale
    half = s // 2

    def one(g):
        # w[c] for corner c of voxel (x, y, z): g[x - dx, y - dy, z - dz]
        # with (dx, dy, dz) in {0, 1}^3; realized as padded shifts.
        gp = jnp.pad(g, ((1, 0), (1, 0), (1, 0)))  # index [x] -> g[x-1]
        stacks = []
        coords = []
        # corner order mirrors gridding_reverse.cu:51-59:
        # (x-1,y-1,z-1), (x-1,y-1,z), (x-1,y,z-1), (x-1,y,z),
        # (x,y-1,z-1), (x,y-1,z), (x,y,z-1), (x,y,z)
        ax = jnp.arange(s)
        for dx in (1, 0):
            for dy in (1, 0):
                for dz in (1, 0):
                    stacks.append(gp[1 - dx:s + 1 - dx, 1 - dy:s + 1 - dy, 1 - dz:s + 1 - dz])
                    coords.append((dx, dy, dz))
        w = jnp.stack(stacks, axis=-1)                       # [s, s, s, 8]
        wsum = jnp.sum(w, axis=-1, keepdims=True)            # [s, s, s, 1]
        safe = jnp.where(wsum < eps, 1.0, wsum)
        wn = w / safe                                        # normalized

        # corner positions (centered): axis value (v - d) - s/2
        vx = (ax[:, None, None, None] - half).astype(g.dtype)
        vy = (ax[None, :, None, None] - half).astype(g.dtype)
        vz = (ax[None, None, :, None] - half).astype(g.dtype)
        dxs = jnp.array([c[0] for c in coords], dtype=g.dtype)
        dys = jnp.array([c[1] for c in coords], dtype=g.dtype)
        dzs = jnp.array([c[2] for c in coords], dtype=g.dtype)
        px = jnp.sum(wn * (vx - dxs), axis=-1)
        py = jnp.sum(wn * (vy - dys), axis=-1)
        pz = jnp.sum(wn * (vz - dzs), axis=-1)
        pts = jnp.stack([px, py, pz], axis=-1)               # [s, s, s, 3]

        # voxels with any zero offset or tiny weight sum emit (0, 0, 0)
        # (gridding_reverse.cu:45-47, 64-66)
        interior = (
            (ax[:, None, None] > 0)
            & (ax[None, :, None] > 0)
            & (ax[None, None, :] > 0)
        )
        keep = interior[..., None] & (wsum >= eps)
        pts = jnp.where(keep, pts, 0.0)
        return pts.reshape(s * s * s, 3) * (2.0 / s)

    return jax.vmap(one)(grid)
