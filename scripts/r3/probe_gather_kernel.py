"""Probe: Pallas fused neighbor-gather+max kernel strategies (round 3).

The serving encoder's hot op is the commute-path neighbor gather
(models/layers.py EdgeConv1x1._commute): XLA take_along_axis reads
random [1, C] rows from HBM at ~34M rows/s = 50.2 ms across the 4
stages at B=32 (docs/STATUS.md round-3). A Pallas kernel can hold the
whole [N, C] table VMEM-resident (v5e VMEM 128M; C=1024 bf16 table is
6M/batch-elem) and gather on-chip, cutting HBM traffic to one
streamed read + write.

The open question is which in-kernel dynamic-gather spelling Mosaic
accepts/performs on v5e; this probe tries, per variant:
  compile -> correctness vs the XLA path -> slope timing.

Run ON TPU (background, natural completion):
  SPARENET_FAST_MATH=1 python scripts/r3/probe_gather_kernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", "32"))
N = int(os.environ.get("N", "3000"))
K = 8
R_HI = 4
NPAD = -(-N // 128) * 128


def slope(name, fn, xs, reps=3):
    cut = lambda s, r: jax.tree_util.tree_map(lambda t: t[:r], s)
    f1 = jax.jit(lambda s: fn(cut(s, 1)))
    fh = jax.jit(lambda s: fn(cut(s, R_HI)))
    float(f1(xs)); float(fh(xs))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(xs)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(xs)); ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:58s} {per * 1000:8.2f} ms", flush=True)
    return per


def scan_sum(body):
    def run(stack):
        def step(acc, inp):
            return acc + body(inp), None
        out, _ = jax.lax.scan(step, jnp.float32(0), stack)
        return out
    return run


# --- XLA reference (current commute gather+max+mean) -----------------------

def xla_gm(g1s, idx):
    gj = jnp.take_along_axis(g1s[:, :, None, :], idx[..., None], axis=1)
    m = jnp.max(gj, axis=2)
    mean = jnp.mean(gj.astype(jnp.float32), axis=(1, 2))
    return m, mean


# --- Pallas variants --------------------------------------------------------

def _gm_kernel_taa(n_valid, gather_via, g_ref, idx_ref, out_ref, sum_ref):
    """g_ref [1, NPAD, C] (f32 or bf16); idx_ref [1, Q, K] int32;
    out_ref [1, Q, C]; sum_ref [1, 1, C] f32 accumulated across tiles.
    Grid: (B, NPAD // Q); the table block is constant in the q axis.
    """
    tab = g_ref[0]                                   # [NPAD, C]
    cast_back = None
    if gather_via == "i32":
        if tab.dtype == jnp.bfloat16:
            tab = tab.astype(jnp.float32)
        cast_back = tab.dtype
        tab = pltpu.bitcast(tab, jnp.int32)
    elif tab.dtype == jnp.bfloat16 and gather_via == "f32":
        tab = tab.astype(jnp.float32)
    q = out_ref.shape[1]
    c = tab.shape[-1]
    m = None
    s = None
    for j in range(K):
        ij = jnp.broadcast_to(idx_ref[0, :, j][:, None], (q, c))
        gj = jnp.take_along_axis(tab, ij, axis=0)
        if cast_back is not None:
            gj = pltpu.bitcast(gj, cast_back)
        gjf = gj.astype(jnp.float32)
        m = gj if m is None else jnp.maximum(m, gj)
        s = gjf if s is None else s + gjf
    out_ref[0] = m.astype(out_ref.dtype)
    qi = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (q, c), 0) + qi * q
    s = jnp.where(row < n_valid, s, 0.0)

    @pl.when(qi == 0)
    def _():
        sum_ref[0] = jnp.zeros_like(sum_ref[0])

    sum_ref[0] = sum_ref[0] + jnp.sum(s, axis=0, keepdims=True)


def pallas_gm(g1s, idx, gather_via="native", q=256, interpret=False):
    """g1s [B, N, C]; idx [B, N, K] -> (max [B, N, C], sum [B, C])."""
    b, n, c = g1s.shape
    gp = jnp.pad(g1s, ((0, 0), (0, NPAD - n), (0, 0)))
    ip = jnp.pad(idx, ((0, 0), (0, NPAD - n), (0, 0)))
    kernel = functools.partial(_gm_kernel_taa, n, gather_via)
    out, ssum = pl.pallas_call(
        kernel,
        grid=(b, NPAD // q),
        in_specs=[
            pl.BlockSpec((1, NPAD, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, K), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, q, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, NPAD, c), g1s.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gp, ip)
    return out[:, :n], ssum[:, 0]


def main():
    rs = np.random.RandomState(0)
    for c in (256, 512, 1024):
        g_np = (rs.rand(B, N, c) - 0.5).astype(np.float32)
        idx_np = rs.randint(0, N, size=(B, N, K)).astype(np.int32)
        for dt in (jnp.float32, jnp.bfloat16):
            g = jnp.asarray(g_np, dt)
            idx = jnp.asarray(idx_np)
            m_ref, mean_ref = jax.jit(xla_gm)(g, idx)
            m_ref = np.asarray(m_ref, np.float32)
            mean_ref = np.asarray(mean_ref)
            name = f"C={c} {dt.__name__}"
            slope(f"  {name} XLA gather+max+mean",
                  scan_sum(lambda p: jnp.sum(xla_gm(p["g"], p["i"])[0]
                                             .astype(jnp.float32))),
                  {"g": jnp.stack([g] * R_HI), "i": jnp.stack([idx] * R_HI)})
            for via in ("native", "f32", "i32"):
                if dt == jnp.float32 and via == "f32":
                    continue
                try:
                    f = jax.jit(functools.partial(pallas_gm, gather_via=via))
                    m, ssum = f(g, idx)
                    m = np.asarray(m, np.float32)
                    mean = np.asarray(ssum) / (N * K)
                    err_m = np.abs(m - m_ref).max()
                    err_mean = np.abs(mean - mean_ref).max()
                    print(f"  {name} pallas[{via}] max|err| m {err_m:.2e} "
                          f"mean {err_mean:.2e}", flush=True)
                    if err_m > 1e-2:
                        print("    -> INCORRECT, skipping timing", flush=True)
                        continue
                    slope(f"  {name} pallas[{via}] gather+max+mean",
                          scan_sum(lambda p: jnp.sum(
                              pallas_gm(p["g"], p["i"], gather_via=via)[0]
                              .astype(jnp.float32))),
                          {"g": jnp.stack([g] * R_HI),
                           "i": jnp.stack([idx] * R_HI)})
                except Exception as e:
                    msg = str(e).split("\n")[0][:140]
                    print(f"  {name} pallas[{via}] FAILED: {msg}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
