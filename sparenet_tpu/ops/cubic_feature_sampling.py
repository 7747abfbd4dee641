"""Cubic feature sampling: gather voxel-grid features at point neighborhoods.

TPU-native equivalent of ``cuda/cubic_feature_sampling``
(cubic_feature_sampling.cu:29-102, __init__.py:13-42).

For each point, features of the (2 * neighborhood_size)^3 grid vertices
surrounding it are gathered (no interpolation weights). Out-of-grid
vertices yield zeros. Gradients flow to the feature volume only (the
CUDA backward leaves point grads zero, cubic_feature_sampling.cu:135-174)
— which autodiff reproduces since points only enter through stop-gradient
integer indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cubic_feature_sampling"]


def cubic_feature_sampling(ptcloud: jnp.ndarray, cubic_features: jnp.ndarray,
                           neighborhood_size: int = 1) -> jnp.ndarray:
    """ptcloud [B, N, 3] in [-1, 1]; cubic_features [B, S, S, S, C]
    (channel-last voxel volume, axes (x, y, z)).

    Returns [B, N, (2 * ns)^3, C].

    Parity: the wrapper scales points by S/2 then shifts by S/2
    (cuda/cubic_feature_sampling/__init__.py:39-42); per point the axis
    range is lower - (ns - 1) .. upper + (ns - 1) with upper = lower + 1
    (cubic_feature_sampling.cu:54-85).
    """
    s = cubic_features.shape[1]
    ns = neighborhood_size
    half = s / 2.0
    p = ptcloud * half + half

    lower = jax.lax.stop_gradient(jnp.floor(p)).astype(jnp.int32)     # [B,N,3]
    offsets = jnp.arange(-(ns - 1), ns + 1, dtype=jnp.int32)          # 2*ns values

    # vertex coordinates per axis: [B, N, 2ns]
    vx = lower[..., 0:1] + offsets
    vy = lower[..., 1:2] + offsets
    vz = lower[..., 2:3] + offsets

    # mesh the three axes -> [B, N, 2ns, 2ns, 2ns]
    gx = vx[..., :, None, None]
    gy = vy[..., None, :, None]
    gz = vz[..., None, None, :]
    in_range = (
        (gx >= 0) & (gx < s) & (gy >= 0) & (gy < s) & (gz >= 0) & (gz < s)
    )
    cx = jnp.clip(gx, 0, s - 1)
    cy = jnp.clip(gy, 0, s - 1)
    cz = jnp.clip(gz, 0, s - 1)

    def gather_one(vol, ix, iy, iz, mask):
        feats = vol[ix, iy, iz]                                       # [N,2ns,2ns,2ns,C]
        return feats * mask[..., None]

    out = jax.vmap(gather_one)(
        cubic_features,
        jnp.broadcast_to(cx, cx.shape[:2] + (2 * ns,) * 3),
        jnp.broadcast_to(cy, cy.shape[:2] + (2 * ns,) * 3),
        jnp.broadcast_to(cz, cz.shape[:2] + (2 * ns,) * 3),
        in_range,
    )
    b, n = ptcloud.shape[:2]
    c = cubic_features.shape[-1]
    return out.reshape(b, n, (2 * ns) ** 3, c)
