"""Probe 3: the production gather_rows_max kernel at the encoder's
real commute shapes (B=32, N=3072, k=8; stage widths 256/256/512/1024),
f32 and bf16 tables, with and without the fused SE sum.

Run ON TPU (background, natural completion):
  python scripts/r3/probe_gather3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.pallas.gather_pallas import gather_rows_max

B, N, K = 32, 3072, 8


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def xla_gm(t, idx, need_sum):
    gj = jnp.take_along_axis(t[:, :, None, :], idx[..., None], axis=1)
    m = jnp.max(gj, axis=2)
    if not need_sum:
        return m
    return m, jnp.sum(gj.astype(jnp.float32), axis=(1, 2))


def main():
    rs = np.random.RandomState(0)
    for c in (256, 512, 1024):
        t_np = (rs.rand(B, N, c) - 0.5).astype(np.float32)
        idx = jnp.asarray(rs.randint(0, N, size=(B, N, K)), jnp.int32)
        for dt in (jnp.float32, jnp.bfloat16):
            t = jnp.asarray(t_np).astype(dt)
            for need_sum in (False, True):
                name = f"C={c:5d} {dt.__name__} sum={int(need_sum)}"
                fx = jax.jit(lambda a, i, s=need_sum: xla_gm(a, i, s))
                r_ref = fx(t, idx)
                try:
                    fp = jax.jit(lambda a, i, s=need_sum:
                                 gather_rows_max(a, i, need_sum=s))
                    r = fp(t, idx)
                    if need_sum:
                        em = np.abs(np.asarray(r[0], np.float32)
                                    - np.asarray(r_ref[0], np.float32)).max()
                        es = np.abs(np.asarray(r[1]) - np.asarray(
                            r_ref[1])).max() / max(
                                1e-9, float(np.abs(r_ref[1]).max()))
                        print(f"{name} max|err| {em:.2e} sum rel {es:.2e}",
                              flush=True)
                    else:
                        em = np.abs(np.asarray(r, np.float32)
                                    - np.asarray(r_ref, np.float32)).max()
                        print(f"{name} max|err| {em:.2e}", flush=True)
                    tx = bench(fx, t, idx)
                    tp = bench(fp, t, idx)
                    print(f"{name} XLA {tx:7.2f} ms  pallas {tp:7.2f} ms "
                          f"({tx / tp:.2f}x)", flush=True)
                except Exception as e:
                    lines = [l for l in str(e).split("\n") if l.strip()]
                    print(f"{name} FAILED: {' | '.join(lines[:2])[:240]}",
                          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
