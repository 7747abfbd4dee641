"""Pallas TPU kernel: fused pairwise-distance + k-nearest-neighbors.

The XLA path (ops/knn.py) materializes the [N, N] distance matrix in HBM
and runs k masked argmin passes over it; this kernel accumulates one
[Q, N] distance tile in VMEM scratch from C-chunked MXU matmuls (the
squared-distance expansion decomposes over feature chunks) and selects
the k nearest in VMEM — the distance matrix never touches HBM.

Output layout: [B, k, N] (k on the sublane axis so each of the k
selection passes issues one aligned [Q]-lane store; dynamic small-lane
writes are not Mosaic-friendly). The dispatcher transposes to the
conventional [B, N, k].
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import graph_dot
from .reduce import argmin_lanes

_BIG = 1e30
_C_CHUNK = 256


def _knn_kernel(k: int, n_valid: int, x_ref, xt_ref, idx_ref, d_scr):
    """x_ref [1, Q, Cc]; xt_ref [1, Cc, N]; idx_ref [1, k, Q];
    d_scr [Q, N]. Grid: (batch, q_tiles, c_chunks) — the distance tile
    accumulates across the (innermost) c dimension."""
    ci = pl.program_id(2)
    nc = pl.num_programs(2)
    xq = x_ref[0]                                            # [Q, Cc]
    yt = xt_ref[0]                                           # [Cc, N]
    q = xq.shape[0]
    n = yt.shape[1]

    y2 = jnp.sum(yt * yt, axis=0, keepdims=True)             # [1, N]
    x2 = jnp.sum(xq * xq, axis=1, keepdims=True)             # [Q, 1]
    part = x2 + y2 - 2.0 * graph_dot(xq, yt)

    @pl.when(ci == 0)
    def _():
        d_scr[:] = part

    @pl.when(ci > 0)
    def _():
        d_scr[:] = d_scr[:] + part

    @pl.when(ci == nc - 1)
    def _():
        lane_n = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
        # mask pads + select in place on the scratch (VMEM headroom)
        d_scr[:] = jnp.where(lane_n >= n_valid, jnp.float32(_BIG), d_scr[:])
        for j in range(k):
            # lowest-index tie-break, matching the XLA reference path
            # (Mosaic argmin picks the highest index on ties)
            i = argmin_lanes(d_scr[:]).astype(jnp.int32)         # [Q]
            idx_ref[0, j, :] = i
            d_scr[:] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (q, n), 1) == i[:, None],
                jnp.float32(_BIG), d_scr[:])


def _knn_onechunk_kernel(k: int, n_valid: int, packed: bool,
                         x_ref, xt_ref, idx_ref):
    """Single-c-chunk variant: the whole [C, N] xt stays VMEM-resident
    across the q-tile axis (its block index is constant in qi, so Mosaic
    fetches it once per batch item), and the distance tile is one
    full-K MXU matmul — no per-chunk accumulate passes and no [N, N]
    scratch. Ablations: the chunked kernel's cost scaled with C through
    the scratch-accumulate passes, not DMA or matmul precision.

    ``packed`` (serving mode): selection ranks a single i32 key per
    candidate — the high bits of the (non-negative) f32 distance's bit
    pattern, which are order-isomorphic to the value, OR'd with the
    lane index in the low bits — so each of the k passes is ONE lane
    min-reduce plus ONE compare/select update (the key is unique per
    lane, so the update touches exactly the selected element), instead
    of the 4-pass exact argmin+mask sequence. Ranking precision is the
    distance truncated to (23 - ceil(log2(n))) mantissa bits with
    lowest-index tie-break; at the encoder's n=3072 that is 11 mantissa
    bits — well inside serving tolerance (the serving-mode distance
    matmul is already single-pass bf16, 7 mantissa bits).
    Grid: (batch, q_tiles)."""
    xq = x_ref[0]                                            # [Q, C]
    yt = xt_ref[0]                                           # [C, N]
    q, n = xq.shape[0], yt.shape[1]

    y2 = jnp.sum(yt * yt, axis=0, keepdims=True)             # [1, N]
    x2 = jnp.sum(xq * xq, axis=1, keepdims=True)             # [Q, 1]
    d = x2 + y2 - 2.0 * graph_dot(xq, yt)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    d = jnp.where(lane_n >= n_valid, jnp.float32(_BIG), d)
    if packed:
        bits = max(int(n - 1).bit_length(), 1)
        # squared distances are mathematically >= 0; clamp the tiny
        # negative float noise so the bit pattern stays order-isomorphic
        d = jnp.maximum(d, 0.0)
        key = (pltpu.bitcast(d, jnp.int32) & jnp.int32(-(1 << bits))) | lane_n
        for j in range(k):
            mk = jnp.min(key, axis=-1)                       # [Q]
            idx_ref[0, j, :] = mk & jnp.int32((1 << bits) - 1)
            key = jnp.where(key == mk[:, None], jnp.int32(0x7FFFFFFF), key)
        return
    for j in range(k):
        i = argmin_lanes(d).astype(jnp.int32)                # [Q]
        idx_ref[0, j, :] = i
        d = jnp.where(lane_n == i[:, None], jnp.float32(_BIG), d)


def _knn_onechunk(xp, xt, k, n, n_pad, c_pad, interpret, packed=False):
    b = xp.shape[0]
    # q-tile (MXU M dimension): larger tiles amortize matmul fill and
    # grid overhead; bounded by VMEM for the [q, n] distance tile.
    # SPARENET_KNN_Q overrides for A/Bs (scripts/r3/probe_knn_q.py).
    q = min(_Q_TILE, n_pad)
    while n_pad % q:
        q //= 2
    kernel = functools.partial(_knn_onechunk_kernel, k, n, packed)
    return pl.pallas_call(
        kernel,
        grid=(b, n_pad // q),
        in_specs=[
            pl.BlockSpec((1, q, c_pad), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, n_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, q), lambda bi, qi: (bi, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, n_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xp, xt)


# ceilings for the single-chunk kernel: the [C, N] xt block must fit
# VMEM alongside the q-tile and selection temporaries
_ONECHUNK_MAX_ELEMS = 1024 * 8192

_Q_TILE = int(os.environ.get("SPARENET_KNN_Q", "128"))


@functools.partial(jax.jit, static_argnames=("k", "interpret", "packed"))
def knn_self_pallas(x: jnp.ndarray, k: int, interpret: bool = False,
                    packed: bool = False) -> jnp.ndarray:
    """Self-kNN indices for x [B, N, C] -> [B, N, k] int32 (includes self;
    lowest-index tie-breaking, same as ops/knn.py).

    ``packed=True`` (serving mode, single-chunk shapes only): packed-key
    selection — ranks by the distance truncated to ~11 mantissa bits;
    see _knn_onechunk_kernel."""
    # neighbor indices are non-differentiable (torch.topk indices in the
    # reference); stop gradients so autodiff never traces the kernel
    x = jax.lax.stop_gradient(x)
    b, n, c = x.shape
    n_pad = -(-n // 128) * 128
    cc = min(_C_CHUNK, -(-c // 128) * 128)
    c_pad = -(-c // cc) * cc
    q = 128 if n_pad >= 128 else n_pad
    while n_pad % q:
        q //= 2

    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    xt = jnp.transpose(xp, (0, 2, 1))                        # [B, C, N]

    if c_pad * n_pad <= _ONECHUNK_MAX_ELEMS:
        idx = _knn_onechunk(xp, xt, k, n, n_pad, c_pad, interpret,
                            packed=packed)
        return jnp.transpose(idx, (0, 2, 1))[:, :n]          # [B, N, k]

    kernel = functools.partial(_knn_kernel, k, n)
    idx = pl.pallas_call(
        kernel,
        grid=(b, n_pad // q, c_pad // cc),
        in_specs=[
            pl.BlockSpec((1, q, cc), lambda bi, qi, ci: (bi, qi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc, n_pad), lambda bi, qi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, q), lambda bi, qi, ci: (bi, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, n_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((q, n_pad), jnp.float32)],
        interpret=interpret,
    )(xp, xt)
    return jnp.transpose(idx, (0, 2, 1))[:, :n]              # [B, N, k]
