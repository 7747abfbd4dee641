"""Neighbor-row gather reductions with lean custom VJPs.

Building blocks of the TRAIN-mode commuted EdgeConv stage
(models/layers.py): the [B, N, k, C] edge tensor of the dense DGCNN
stage (reference: models/sparenet_generator.py:880-906 edge features +
:188-242 stage convs) exists only transiently inside these two
reductions, never as a stored activation, and the backward scatters
carry [B, M, C]-sized gradients instead of replaying a 5-pass
elementwise chain over the edge tensor.

  gather_rows_sum(g, idx)        s[b,m,c]  = sum_j g[b, idx[b,m,j], c]
  gather_rows_scaled_max(g, idx) m[b,m,c]  = max_j g[b, idx[b,m,j], c]

VJPs:
  sum: scatter-add of the output gradient into each of the k source
       rows (residual = idx only).
  max: route the gradient to the FIRST maximal neighbor per (b, m, c)
       (residual = idx + the int8 winner slot). NOTE: jnp.max's own VJP
       splits gradients equally among exact ties; ties are measure-zero
       on real activations, and first-winner routing matches the CUDA
       reference's atomic-argmax convention rather than jax's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather(g, idx):
    """g [B, N, C], idx [B, M, k] -> [B, M, k, C]."""
    return jnp.take_along_axis(g[:, :, None, :], idx[..., None], axis=1)


@jax.custom_vjp
def gather_rows_sum(g: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """g [B, N, C], idx [B, M, k] int32 -> [B, M, C] sum over the k rows."""
    return jnp.sum(_gather(g, idx), axis=2)


def _sum_fwd(g, idx):
    return gather_rows_sum(g, idx), (g.shape, idx)


def _sum_bwd(res, grad):
    shape, idx = res
    b = shape[0]
    bb = jnp.arange(b)[:, None]
    # one row scatter per neighbor slot: peak memory stays [B, M, C]
    # (a single fused [B, M, k, C] update tensor OOMs the B=24
    # production step next to the optimizer state)
    out = jnp.zeros(shape, grad.dtype)
    for j in range(idx.shape[-1]):
        out = out.at[bb, idx[:, :, j], :].add(grad)
    return out, None


gather_rows_sum.defvjp(_sum_fwd, _sum_bwd)


@jax.custom_vjp
def gather_rows_scaled_max(g: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """g [B, N, C], idx [B, M, k] int32 -> [B, M, C] max over the k rows.

    "scaled" in the name records the intended use: rows are pre-scaled
    by the BN affine slope before the call, so max-over-k commutes with
    the downstream per-channel affine for either sign of the slope
    (models/layers.py EdgeConv1x1._commute)."""
    return jnp.max(_gather(g, idx), axis=2)


def _max_fwd(g, idx):
    gj = _gather(g, idx)
    win = jnp.argmax(gj, axis=2).astype(jnp.int8)      # [B, M, C]
    return jnp.max(gj, axis=2), (g.shape, idx, win)


def _max_bwd(res, grad):
    shape, idx, win = res
    b = shape[0]
    k = idx.shape[-1]
    bb = jnp.arange(b)[:, None]
    # per-slot masked row scatter (see _sum_bwd on why not one fused
    # [B, M, k, C] one-hot update)
    out = jnp.zeros(shape, grad.dtype)
    for j in range(k):
        upd = jnp.where(win == jnp.int8(j), grad, 0)       # [B, M, C]
        out = out.at[bb, idx[:, :, j], :].add(upd)
    return out, None


gather_rows_scaled_max.defvjp(_max_fwd, _max_bwd)
