"""Shared helpers for the TPU op layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


def pick_chunk(n: int, m: int, budget_elems: int = 1 << 21, floor: int = 256) -> int:
    """Pick a query-axis chunk so a [chunk, m] tile stays within budget."""
    if n * m <= budget_elems:
        return n
    return max(min(floor, n), min(n, budget_elems // max(m, 1)))


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances between rows of x [N,C] and y [M,C].

    Uses the |x|^2 + |y|^2 - 2<x,y> expansion so the dominant cost is a
    matmul that lands on the MXU.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # [N, 1]
    y2 = jnp.sum(y * y, axis=-1)                          # [M]
    # HIGHEST precision: fp32-accurate MXU passes, required for argmin /
    # top-k parity with the fp32 CUDA reference.
    d = x2 + y2[None, :] - 2.0 * jax.lax.dot_general(
        x, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(d, 0.0)
