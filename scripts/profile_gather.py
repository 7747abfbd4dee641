"""Experiment: fast kNN-neighbor gather+max on TPU.

The encoder's edge path spends most of its time in
take_along_axis([B,N,1,C], idx[B,N,k,1]) materializing [B,N,k,C] and
reducing max over k. This script tests whether a Pallas kernel using
Mosaic's lane-axis dynamic gather (jnp.take along the minor axis of a
channel-major [C, N] layout) can produce max_j/min_j g1[idx_j] without
materializing the edge tensor.

Variants:
  xla      take_along_axis + max (current path)
  pallas   per-q-tile loop over k lane-gathers, running max in VMEM
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_default_matmul_precision", "bfloat16")


def timed(name, fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1000:9.1f} ms", flush=True)


def gather_max_kernel(k: int, gt_ref, idx_ref, mx_ref):
    """gt_ref [1, Cb, N]; idx_ref [1, k, N] int32; mx_ref [1, Cb, N].
    Mosaic dynamic_gather wants input/indices/output the SAME shape
    (gather along lanes): per j, broadcast the [N] index row over the
    Cb sublanes and take_along_axis on the lane axis; running max."""
    gt = gt_ref[0]                                   # [Cb, N]
    cb, n = gt.shape
    acc = None
    for j in range(k):
        ids = jnp.broadcast_to(idx_ref[0, j][None, :], (cb, n))
        g = jnp.take_along_axis(gt, ids, axis=1)     # [Cb, N] lane gather
        acc = g if acc is None else jnp.maximum(acc, g)
    mx_ref[0] = acc


def pallas_gather_max(g1, idx, cb=256, vmem_mb=96):
    b, n, c = g1.shape
    k = idx.shape[-1]
    n_pad = -(-n // 128) * 128
    cb = min(cb, c)
    gt = jnp.moveaxis(jnp.pad(g1, ((0, 0), (0, n_pad - n), (0, 0))), -1, 1)
    # pad index rows with 0 (gathers row 0; harmless, sliced off below)
    idxt = jnp.moveaxis(jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0))),
                        -1, 1)                       # [B, k, N]
    out = pl.pallas_call(
        functools.partial(gather_max_kernel, k),
        grid=(b, c // cb),
        in_specs=[
            pl.BlockSpec((1, cb, n_pad), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n_pad), lambda bi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cb, n_pad), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(gt, idxt)
    return jnp.moveaxis(out, 1, -1)[:, :n]


def main():
    rs = np.random.RandomState(0)
    B, N, k = 32, 3000, 8
    for C in (256, 1024):
        g1 = jnp.asarray(rs.rand(B, N, C) - 0.5, jnp.float32)
        idx = jnp.asarray(rs.randint(0, N, (B, N, k)), jnp.int32)

        f_x = jax.jit(lambda g, i: jnp.sum(jnp.max(jnp.take_along_axis(
            g[:, :, None, :], i[..., None], axis=1), axis=2)))
        timed(f"xla gather+max C={C}", lambda: float(f_x(g1, idx)))

        f_p = jax.jit(lambda g, i: jnp.sum(pallas_gather_max(g, i)))
        try:
            got = jax.block_until_ready(f_p(g1, idx))
            ref = f_x(g1, idx)
            print(f"  pallas match: {np.allclose(float(got), float(ref), rtol=1e-6)}"
                  f"  ({float(got):.1f} vs {float(ref):.1f})", flush=True)
            timed(f"pallas lane-gather+max C={C}", lambda: float(f_p(g1, idx)))
        except Exception as e:
            print(f"  pallas C={C} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
