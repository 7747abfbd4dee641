"""Probe: kNN one-chunk q-tile (MXU M dimension) sweep.

profile_head shows the packed kNN's cost is distance-matmul dominated
(0.9 ms at C=3 vs 4.6/7.2 ms at C=256/512), and the kernel runs
[q=128, C] x [C, 3072] matmuls — a small M for the MXU. Larger q-tiles
amortize fill + grid overhead at the cost of a bigger [q, n] distance
tile in VMEM.

Run ON TPU (background, natural completion):
  python scripts/r3/probe_knn_q.py
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

import sparenet_tpu.ops.pallas.knn_pallas as kp

B, N, K = 32, 3072, 8
R_HI = 4


def slope(name, fn, xs, reps=3):
    cut = lambda s, r: s[:r]

    def run(s):
        def step(acc, x):
            return acc + jnp.sum(fn(x).astype(jnp.float32)), None
        out, _ = jax.lax.scan(step, jnp.float32(0), s)
        return out

    f1 = jax.jit(lambda s: run(cut(s, 1)))
    fh = jax.jit(lambda s: run(cut(s, R_HI)))
    float(f1(xs)); float(fh(xs))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(xs)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(xs)); ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:44s} {per * 1000:8.2f} ms", flush=True)
    return per


def main():
    rs = np.random.RandomState(0)
    for c in (3, 256, 512):
        xs = jnp.asarray(rs.rand(R_HI, B, N, c) - 0.5, jnp.float32)
        ref = None
        for q in (128, 256, 512, 1024):
            kp._Q_TILE = q
            # _Q_TILE is read inside knn_self_pallas's own jit; the
            # cache keys on (shapes, k, packed) only — must invalidate
            jax.clear_caches()
            for packed in (True, False) if q in (128, 512) else (True,):
                try:
                    f = lambda x, p=packed: kp.knn_self_pallas(x, K, packed=p)
                    out = np.asarray(jax.jit(jax.vmap(f))(xs))
                    if ref is None:
                        ref = out
                    eq = float((out == ref).mean())
                    slope(f"C={c:4d} q={q:5d} packed={int(packed)} "
                          f"(idx-agree {eq:.3f})", f, xs)
                except Exception as e:
                    lines = [l for l in str(e).split("\n") if l.strip()]
                    print(f"C={c:4d} q={q:5d} packed={int(packed)} "
                          f"FAILED: {' | '.join(lines[:2])[:200]}",
                          flush=True)
        kp._Q_TILE = 128
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
