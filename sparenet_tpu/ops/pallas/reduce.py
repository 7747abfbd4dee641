"""Kernel-side reductions with XLA-parity tie-breaking.

Mosaic's lowering of ``jnp.argmin`` inside a Pallas TPU kernel does NOT
guarantee the lowest-index tie-break that XLA's argmin documents (and
that the pure-XLA reference paths in sparenet_tpu.ops rely on) — on tie-
heavy inputs (e.g. MDS densities that underflow to exact 0, duplicated
points in kNN) the hardware kernel silently diverges from the XLA
reference (measured: 74% index divergence on small MDS shapes,
scripts/debug_mds_staged.py). These helpers implement the explicit
two-pass form: reduce to the extreme value, then take the minimum lane
index among its occurrences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["argmin_lanes", "argmax_lanes"]


def argmin_lanes(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Lowest-index argmin along the lane (last) axis of x [..., N]."""
    n = x.shape[-1]
    m = jnp.min(x, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.min(jnp.where(x == m, lane, n), axis=-1, keepdims=keepdims)


def argmax_lanes(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Lowest-index argmax along the lane (last) axis of x [..., N]."""
    n = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.min(jnp.where(x == m, lane, n), axis=-1, keepdims=keepdims)
