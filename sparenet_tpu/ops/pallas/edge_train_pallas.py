"""Fused edge-gather statistics kernels for the TRAIN-mode commuted
EdgeConv stage (models/layers.py; reference dense chain
models/sparenet_generator.py:188-242, 852-906).

The train-commute identity needs, per point, four reductions over its
k gathered neighbor rows: max, min (the BN-affine sign-correct extrema
pair), sum (s1, for the cross term of the factorized variance and the
SE squeeze), and sum-of-squares (s2, for the variance). The pure-XLA
formulation loses to the dense chain on TPU because XLA serializes its
scalar-index scatters (ops/common.py:TRAIN_COMMUTE); this pair keeps
the [N, C] table VMEM-resident in BOTH directions:

  forward  — one pass over the k rows per point accumulating all four
             statistics in registers (gather_pallas's layout: table as
             [CC, NPAD, 128] so a point-row is an aligned vreg slice);
  backward — a table-accumulate scatter: the gradient table [N, C]
             lives in VMEM across the whole grid row, each point's
             four gradient rows are combined into its k source rows
             in registers (winner routing recomputed by comparing the
             re-read row against the saved max/min — exact f32
             equality of identical values), and the table flushes to
             HBM once. No XLA scatter is ever emitted.

Gradient conventions match ops/edge_gather.py: max/min route to the
FIRST extremal slot; sum broadcasts; sumsq contributes 2*row*grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["edge_gather_stats", "edge_gather_stats_supported"]

_MAX_TABLE_ELEMS = 1024 * 8192  # same residency bound as gather_pallas


def _fwd_kernel(k: int, q: int, *refs):
    """tab_ref [1, CC, NPAD, 128]; idx_ref [1, q, K] i32 (SMEM);
    outs: mx, mn, s1, s2 each [1, CC, q, 128]. Grid: (B, MP // q)."""
    tab_ref, idx_ref, mx_ref, mn_ref, s1_ref, s2_ref = refs

    def body(i, _):
        mx = mn = s1 = s2 = None
        for j in range(k):
            ii = idx_ref[0, i, j]
            row = tab_ref[0, :, pl.ds(ii, 1), :]            # [CC, 1, 128]
            if mx is None:
                mx, mn = row, row
                s1 = row
                s2 = row * row
            else:
                mx = jnp.maximum(mx, row)
                mn = jnp.minimum(mn, row)
                s1 = s1 + row
                s2 = s2 + row * row
        mx_ref[0, :, pl.ds(i, 1), :] = mx
        mn_ref[0, :, pl.ds(i, 1), :] = mn
        s1_ref[0, :, pl.ds(i, 1), :] = s1
        s2_ref[0, :, pl.ds(i, 1), :] = s2
        return 0

    jax.lax.fori_loop(0, q, body, 0)


def _bwd_kernel(k: int, q: int, n_chunks: int, *refs):
    """tab_ref [1, CC, NPAD, 128] (constant over chunks);
    idx_ref [1, q, K] i32 (SMEM); saved mx/mn + grads gmx/gmn/gs1/gs2
    each [1, CC, q, 128]; out acc_ref [1, CC, NPAD, 128] accumulated
    across the chunk axis. Grid: (B, MP // q)."""
    (tab_ref, idx_ref, mx_ref, mn_ref, gmx_ref, gmn_ref, gs1_ref,
     gs2_ref, acc_ref) = refs
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def body(i, _):
        mx = mx_ref[0, :, pl.ds(i, 1), :]
        mn = mn_ref[0, :, pl.ds(i, 1), :]
        gmx = gmx_ref[0, :, pl.ds(i, 1), :]
        gmn = gmn_ref[0, :, pl.ds(i, 1), :]
        gs1 = gs1_ref[0, :, pl.ds(i, 1), :]
        gs2 = gs2_ref[0, :, pl.ds(i, 1), :]
        routed_mx = jnp.zeros_like(mx, dtype=jnp.bool_)
        routed_mn = jnp.zeros_like(mn, dtype=jnp.bool_)
        for j in range(k):
            ii = idx_ref[0, i, j]
            row = tab_ref[0, :, pl.ds(ii, 1), :]
            hit_mx = (row == mx) & (~routed_mx)
            hit_mn = (row == mn) & (~routed_mn)
            routed_mx = routed_mx | hit_mx
            routed_mn = routed_mn | hit_mn
            contrib = (gs1 + 2.0 * row * gs2
                       + jnp.where(hit_mx, gmx, 0.0)
                       + jnp.where(hit_mn, gmn, 0.0))
            acc_ref[0, :, pl.ds(ii, 1), :] += contrib
        return 0

    jax.lax.fori_loop(0, q, body, 0)


def _pack(x, b, n_pad, cc):
    """[B, N, C] -> [B, CC, NPAD, 128] (pad + fold channels)."""
    n, c = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, cc * 128 - c)))
    return jnp.transpose(xp.reshape(b, n_pad, cc, 128), (0, 2, 1, 3))


def _unpack(x4, m, c):
    b = x4.shape[0]
    out = jnp.transpose(x4, (0, 2, 1, 3))
    return out.reshape(b, x4.shape[2], x4.shape[1] * 128)[:, :m, :c]


@functools.partial(jax.jit, static_argnames=("q", "interpret"))
def _stats_fwd_impl(table, idx, q=512, interpret=False):
    b, n, c = table.shape
    m, k = idx.shape[1], idx.shape[2]
    c_pad = max(-(-c // 128) * 128, 128)
    cc = c_pad // 128
    q = min(q, max(-(-m // 8) * 8, 8))
    n_pad = -(-max(n, m) // q) * q
    m_pad = -(-m // q) * q

    t4 = _pack(table, b, n_pad, cc)
    ip = jnp.pad(idx, ((0, 0), (0, m_pad - m), (0, 0))).astype(jnp.int32)

    kernel = functools.partial(_fwd_kernel, k, q)
    shape = jax.ShapeDtypeStruct((b, cc, m_pad, 128), jnp.float32)
    spec = pl.BlockSpec((1, cc, q, 128), lambda bi, qi: (bi, 0, qi, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b, m_pad // q),
        in_specs=[
            pl.BlockSpec((1, cc, n_pad, 128), lambda bi, qi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, k), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[spec] * 4,
        out_shape=[shape] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(t4, ip)
    return tuple(_unpack(o, m, c) for o in outs)


@functools.partial(jax.jit, static_argnames=("q", "interpret"))
def _stats_bwd_impl(table, idx, mx, mn, gmx, gmn, gs1, gs2,
                    q=512, interpret=False):
    b, n, c = table.shape
    m, k = idx.shape[1], idx.shape[2]
    c_pad = max(-(-c // 128) * 128, 128)
    cc = c_pad // 128
    q = min(q, max(-(-m // 8) * 8, 8))
    n_pad = -(-max(n, m) // q) * q
    m_pad = -(-m // q) * q
    n_chunks = m_pad // q

    t4 = _pack(table, b, n_pad, cc)
    ip = jnp.pad(idx, ((0, 0), (0, m_pad - m), (0, 0))).astype(jnp.int32)

    def packm(x):
        # zero-pad the gradient rows: padded points contribute nothing
        return _pack(x.astype(jnp.float32), b, m_pad, cc)

    kernel = functools.partial(_bwd_kernel, k, q, n_chunks)
    tile = pl.BlockSpec((1, cc, q, 128), lambda bi, qi: (bi, 0, qi, 0),
                        memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, cc, n_pad, 128), lambda bi, qi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, k), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            tile, tile, tile, tile, tile, tile,
        ],
        out_specs=pl.BlockSpec((1, cc, n_pad, 128),
                               lambda bi, qi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cc, n_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(t4, ip, packm(mx), packm(mn), packm(gmx), packm(gmn),
      packm(gs1), packm(gs2))
    return _unpack(acc, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def edge_gather_stats(table, idx, interpret=False):
    """table [B, N, C] f32, idx [B, M, k] int32 ->
    (mx, mn, s1, s2) each [B, M, C] f32: per-point max / min / sum /
    sum-of-squares over the k gathered rows. Differentiable w.r.t.
    table (max/min route to the first extremal slot, like
    ops/edge_gather.py); idx is non-differentiable."""
    return _stats_fwd_impl(jax.lax.stop_gradient(table),
                           jax.lax.stop_gradient(idx),
                           interpret=interpret)


def _egs_fwd(table, idx, interpret):
    outs = _stats_fwd_impl(table, idx, interpret=interpret)
    mx, mn, _, _ = outs
    return outs, (table, idx, mx, mn)


def _egs_bwd(interpret, res, grads):
    table, idx, mx, mn = res
    gmx, gmn, gs1, gs2 = grads
    gt = _stats_bwd_impl(table, idx, mx, mn, gmx, gmn, gs1, gs2,
                         interpret=interpret)
    return gt, None


edge_gather_stats.defvjp(_egs_fwd, _egs_bwd)


def edge_gather_stats_supported(n: int, c: int) -> bool:
    """VMEM residency gate: the backward holds table + grad table."""
    c_pad = max(-(-c // 128) * 128, 128)
    n_pad = -(-n // 512) * 512
    return 2 * c_pad * n_pad <= _MAX_TABLE_ELEMS