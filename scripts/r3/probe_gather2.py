"""Probe 2: Mosaic in-kernel gather spellings for the commute-path
neighbor gather+max (round 3).

probe_gather_kernel.py's variants all failed: Mosaic's lax.gather
lowering (jax 0.9 _gather_lowering_rule) ONLY accepts 2-D
take_along_axis where the index array has the SAME shape as the
operand — i.e. tpu.dynamic_gather over sublanes (axis 0) or lanes
(axis 1) with a full [R, C]-shaped index map. So the per-neighbor-slot
spelling is: K gathers of the whole [NPAD, C] table with the slot's
row-index vector broadcast across channels, max-accumulated.

Variants:
  dg0   sublane dynamic_gather: out[r, c] = tab[idx[r], c]
  dg1   lane dynamic_gather on the transposed table:
        outT[c, r] = tabT[c, idx[r]]
  loop  scalar-indexed vreg-row gather: table pre-reshaped to
        [C/128, NPAD, 128] so one point-row is a [C/128, 1, 128]
        aligned slice; indices streamed through SMEM blocks
  i8    XLA-level int8 table rows (half the gather bytes of bf16),
        max in int8, dequant per channel after the max (exact for
        monotone per-channel scaling)

Run ON TPU (background, natural completion):
  python scripts/r3/probe_gather2.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_gather_kernel import slope, scan_sum, xla_gm, B, N, K, NPAD


# --- dg0 / dg1: full-shape dynamic_gather, one pass per neighbor slot ------

def _dg0_kernel(g_ref, idx_ref, out_ref):
    """g_ref [1, NPAD, C]; idx_ref [1, K, NPAD] i32; out_ref [1, NPAD, C]."""
    tab = g_ref[0]
    c = tab.shape[-1]
    m = None
    for j in range(K):
        ij = jnp.broadcast_to(idx_ref[0, j, :][:, None], tab.shape)
        gj = jnp.take_along_axis(tab, ij, axis=0, mode="promise_in_bounds")
        m = gj if m is None else jnp.maximum(m, gj)
    out_ref[0] = m


def _dg1_kernel(g_ref, idx_ref, out_ref):
    """g_ref [1, C, NPAD] (transposed); idx_ref [1, K, NPAD];
    out_ref [1, C, NPAD]."""
    tab = g_ref[0]
    m = None
    for j in range(K):
        ij = jnp.broadcast_to(idx_ref[0, j, :][None, :], tab.shape)
        gj = jnp.take_along_axis(tab, ij, axis=1, mode="promise_in_bounds")
        m = gj if m is None else jnp.maximum(m, gj)
    out_ref[0] = m


def pallas_dg(g1s, idx, axis=0, interpret=False):
    """g1s [B, N, C]; idx [B, N, K] -> max [B, N, C]."""
    b, n, c = g1s.shape
    gp = jnp.pad(g1s, ((0, 0), (0, NPAD - n), (0, 0)))
    ip = jnp.pad(idx, ((0, 0), (0, NPAD - n), (0, 0)))
    it = jnp.transpose(ip, (0, 2, 1)).astype(jnp.int32)     # [B, K, NPAD]
    if axis == 0:
        out = pl.pallas_call(
            _dg0_kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, NPAD, c), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, NPAD), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NPAD, c), lambda bi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, NPAD, c), g1s.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(gp, it)
        return out[:, :n]
    gt = jnp.transpose(gp, (0, 2, 1))                       # [B, C, NPAD]
    out = pl.pallas_call(
        _dg1_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, NPAD), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, NPAD), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, NPAD), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, NPAD), g1s.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(gt, it)
    return jnp.transpose(out, (0, 2, 1))[:, :n]


# --- loop: scalar-indexed vreg-row gather ----------------------------------

def _loop_kernel(q, g_ref, idx_ref, out_ref):
    """g_ref [1, CC, NPAD, 128] f32; idx_ref [1, q, K] i32 in SMEM;
    out_ref [1, CC, q, 128]. Grid: (B, NPAD // q)."""
    def body(i, _):
        acc = None
        for j in range(K):
            ii = idx_ref[0, i, j]
            row = g_ref[0, :, pl.ds(ii, 1), :]              # [CC, 1, 128]
            acc = row if acc is None else jnp.maximum(acc, row)
        out_ref[0, :, pl.ds(i, 1), :] = acc
        return _
    jax.lax.fori_loop(0, q, body, 0)


def pallas_loop(g1s, idx, q=512, interpret=False):
    b, n, c = g1s.shape
    cc = c // 128
    gp = jnp.pad(g1s, ((0, 0), (0, NPAD - n), (0, 0)))
    # [B, NPAD, CC, 128] -> [B, CC, NPAD, 128]
    g4 = jnp.transpose(gp.reshape(b, NPAD, cc, 128), (0, 2, 1, 3))
    ip = jnp.pad(idx, ((0, 0), (0, NPAD - n), (0, 0))).astype(jnp.int32)
    kernel = functools.partial(_loop_kernel, q)
    out = pl.pallas_call(
        kernel,
        grid=(b, NPAD // q),
        in_specs=[
            pl.BlockSpec((1, cc, NPAD, 128), lambda bi, qi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, K), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, cc, q, 128), lambda bi, qi: (bi, 0, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cc, NPAD, 128), g1s.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(g4, ip)
    # [B, CC, NPAD, 128] -> [B, NPAD, C]
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, NPAD, c)[:, :n]


# --- i8: XLA gather of int8 rows, dequant after max ------------------------

def xla_i8(gq, idx, scale):
    gj = jnp.take_along_axis(gq[:, :, None, :], idx[..., None], axis=1)
    m = jnp.max(gj, axis=2)                                 # int8 max
    return m.astype(jnp.float32) * scale[None, None, :]


def main():
    rs = np.random.RandomState(0)
    for c in (512, 1024):
        g_np = (rs.rand(B, N, c) - 0.5).astype(np.float32)
        idx_np = rs.randint(0, N, size=(B, N, K)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        g32 = jnp.asarray(g_np)
        m_ref = np.asarray(jax.jit(lambda g, i: xla_gm(g, i)[0])(g32, idx))

        for dt in (jnp.float32, jnp.bfloat16):
            g = g32.astype(dt)
            name = f"C={c} {dt.__name__}"
            slope(f"  {name} XLA gather+max",
                  scan_sum(lambda p: jnp.sum(
                      jnp.max(jnp.take_along_axis(
                          p["g"][:, :, None, :], p["i"][..., None], axis=1),
                          axis=2).astype(jnp.float32))),
                  {"g": jnp.stack([g] * 4), "i": jnp.stack([idx] * 4)})
            for vname, fn in (
                ("dg0", functools.partial(pallas_dg, axis=0)),
                ("dg1", functools.partial(pallas_dg, axis=1)),
                ("loop", pallas_loop),
            ):
                if vname == "loop" and dt != jnp.float32:
                    continue
                try:
                    m = np.asarray(jax.jit(fn)(g, idx), np.float32)
                    err = np.abs(m - m_ref).max()
                    tol = 1e-6 if dt == jnp.float32 else 4e-3
                    print(f"  {name} pallas[{vname}] max|err| {err:.2e}",
                          flush=True)
                    if err > tol:
                        print("    -> INCORRECT, skipping timing", flush=True)
                        continue
                    slope(f"  {name} pallas[{vname}] gather+max",
                          scan_sum(lambda p, f=fn: jnp.sum(
                              f(p["g"], p["i"]).astype(jnp.float32))),
                          {"g": jnp.stack([g] * 4), "i": jnp.stack([idx] * 4)})
                except Exception as e:
                    lines = [l for l in str(e).split("\n") if l.strip()]
                    print(f"  {name} pallas[{vname}] FAILED: "
                          f"{' | '.join(lines[:3])[:300]}", flush=True)

        # int8 rows
        scale = jnp.asarray(np.abs(g_np).max(axis=(0, 1)) / 127.0)
        gq = jnp.asarray(
            np.clip(np.round(g_np / np.asarray(scale)), -127, 127), jnp.int8)
        m8 = np.asarray(jax.jit(xla_i8)(gq, idx, scale))
        err = np.abs(m8 - m_ref).max()
        print(f"  C={c} int8 XLA max|err| {err:.2e} "
              f"(quant step {float(scale.max()):.2e})", flush=True)
        slope(f"  C={c} int8 XLA gather+max+dequant",
              scan_sum(lambda p: jnp.sum(xla_i8(p["g"], p["i"], scale))),
              {"g": jnp.stack([gq] * 4), "i": jnp.stack([idx] * 4)})
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
