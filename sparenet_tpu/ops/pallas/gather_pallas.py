"""Fused neighbor gather + max Pallas kernel (encoder commute path).

The eval-mode EdgeConv max-commute path (models/layers.py:EdgeConv1x1.
_commute; reference dense chain models/sparenet_generator.py:188-242,
852-906) reduces each stage to ONE C-wide neighbor gather followed by a
max over the k=8 gathered rows. XLA lowers that gather as a dynamic-
slice loop from HBM at random-row DMA rate (~31 M rows/s measured),
then materializes the [B, N, k, C] edge tensor for the max — the
encoder's single hottest pattern (50 ms of a 153 ms serving forward at
B=32).

This kernel keeps the whole [N, C] per-cloud table VMEM-resident
(reshaped to [C/128, N, 128] so one point-row is an aligned
[C/128, 1, 128] vreg slice), streams the neighbor indices through SMEM,
and max-accumulates the k rows in registers — the edge tensor never
exists and nothing round-trips HBM. Measured vs the XLA gather+max at
B=32, N=3072, k=8 (scripts/r3/probe_gather2.py, v5e): 6.48 ms vs
16.32 ms (C=512 f32), 11.73 ms vs 23.99 ms (C=1024 f32); exact
(max of identical rows, no reassociation).

``need_sum`` additionally returns the f32 SUM of every (valid) gathered
row — the SE squeeze statistic mean(gj) the commute path needs — as a
second fused accumulation over the same register rows (a separate XLA
pass would re-gather all B*N*k rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows_max"]

# whole-table VMEM residency bound: [CC, NPAD, 128] f32 plus the output
# tile must fit comfortably; 8M f32 elems = 32 MB (v5e VMEM is 128 MB)
_MAX_TABLE_ELEMS = 1024 * 8192


def _kernel(k: int, q: int, m_valid: int, need_sum: bool, *refs):
    """tab_ref [1, CC, NPAD, 128]; idx_ref [1, q, K] i32 (SMEM);
    out_ref [1, CC, q, 128]; sum_ref [1, 1, CC, 128] f32 (optional).
    Grid: (B, MP // q); the table block index is constant in the tile
    axis, so Mosaic fetches it once per batch item."""
    if need_sum:
        tab_ref, idx_ref, out_ref, sum_ref = refs
    else:
        tab_ref, idx_ref, out_ref = refs
        sum_ref = None
    qi = pl.program_id(1)
    cc = tab_ref.shape[1]

    def body(i, acc):
        m = None
        s = None
        for j in range(k):
            ii = idx_ref[0, i, j]
            row = tab_ref[0, :, pl.ds(ii, 1), :]            # [CC, 1, 128]
            m = row if m is None else jnp.maximum(m, row)
            if need_sum:
                r32 = row.astype(jnp.float32)
                s = r32 if s is None else s + r32
        out_ref[0, :, pl.ds(i, 1), :] = m
        if not need_sum:
            return acc
        valid = (qi * q + i) < m_valid                      # pad rows: skip
        return acc + jnp.where(valid, s, jnp.zeros_like(s))

    init = (jnp.zeros((cc, 1, 128), jnp.float32) if need_sum
            else jnp.float32(0.0))
    acc = jax.lax.fori_loop(0, q, body, init)
    if need_sum:
        sum_ref[0, 0] = acc[:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("need_sum", "q", "interpret"))
def gather_rows_max(table: jnp.ndarray, idx: jnp.ndarray,
                    need_sum: bool = False, q: int = 512,
                    interpret: bool = False):
    """max over gathered rows: out[b, m] = max_j table[b, idx[b, m, j]].

    table [B, N, C] (f32 or bf16), idx [B, M, K] int32 with values in
    [0, N). Returns out [B, M, C] in table's dtype; with ``need_sum``
    also returns s [B, C] f32 = sum over (m, j) of table[b, idx[b,m,j]]
    (so mean(gj) = s / (M*K)). Exact — selects/sums the identical rows
    the XLA take_along_axis + max/mean pair would.

    bf16 tables are upcast to f32 for the kernel and the max cast back
    — value-identical (every bf16 is exactly representable in f32; max
    commutes with the cast; the sum is f32 of the same values), and
    required because Mosaic cannot sublane-slice packed 16-bit rows
    (compile error at kernel build, probe_gather3 round 3).
    """
    b, n, c = table.shape
    m = idx.shape[1]
    k = idx.shape[2]
    # indices are neighbor picks — non-differentiable; the table rows
    # flow through max, whose VJP this eval-only path never needs
    table = jax.lax.stop_gradient(table)
    idx = jax.lax.stop_gradient(idx)
    out_dtype = table.dtype
    if table.dtype == jnp.bfloat16:
        table = table.astype(jnp.float32)

    c_pad = max(-(-c // 128) * 128, 128)
    q = min(q, max(-(-m // 8) * 8, 8))
    n_pad = -(-max(n, m) // q) * q
    m_pad = -(-m // q) * q
    cc = c_pad // 128

    tp = jnp.pad(table, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    # [B, NPAD, CC, 128] -> [B, CC, NPAD, 128]: point-rows become
    # aligned vreg slices along the sublane axis
    t4 = jnp.transpose(tp.reshape(b, n_pad, cc, 128), (0, 2, 1, 3))
    ip = jnp.pad(idx, ((0, 0), (0, m_pad - m), (0, 0))).astype(jnp.int32)

    kernel = functools.partial(_kernel, k, q, m, need_sum)
    out_shapes = [jax.ShapeDtypeStruct((b, cc, m_pad, 128), table.dtype)]
    out_specs = [pl.BlockSpec((1, cc, q, 128), lambda bi, qi: (bi, 0, qi, 0),
                              memory_space=pltpu.VMEM)]
    if need_sum:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, m_pad // q, cc, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, cc, 128), lambda bi, qi: (bi, qi, 0, 0),
                         memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        kernel,
        grid=(b, m_pad // q),
        in_specs=[
            pl.BlockSpec((1, cc, n_pad, 128), lambda bi, qi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, k), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(t4, ip)

    out = jnp.transpose(res[0], (0, 2, 1, 3)).reshape(b, m_pad, c_pad)
    out = out[:, :m, :c].astype(out_dtype)
    if not need_sum:
        return out
    s = jnp.sum(res[1], axis=1).reshape(b, c_pad)[:, :c]    # [B, C]
    return out, s


def gather_rows_max_supported(n: int, c: int) -> bool:
    """Whole-table VMEM residency gate (mirrors knn_pallas's one-chunk
    bound): the padded [C, N] table must fit in VMEM."""
    c_pad = max(-(-c // 128) * 128, 128)
    n_pad = -(-n // 512) * 512
    return c_pad * n_pad <= _MAX_TABLE_ELEMS
