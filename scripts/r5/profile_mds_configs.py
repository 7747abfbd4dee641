"""Directly slope-time _mds_batched at each dial/schedule config
(round 5) — the component-level profiler (profile_mds_rounds.py)
mispriced both ingredients by breaking XLA's reduction fusion with
strided consumption; this measures the REAL jitted selection cost per
config at the production shape (B=32, 19456 -> 16384, return_xyz as
the serving path consumes it).

Run ON TPU in background:  python scripts/r5/profile_mds_configs.py
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

B, N, NPOINT = 32, 19456, 16384


def slope(fn, xs4, mml):
    @jax.jit
    def run1(xs):
        return fn(xs[0])

    @jax.jit
    def run4(xs):
        def body(acc, x):
            return acc + fn(x), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    float(run1(xs4)); float(run4(xs4))
    t0 = time.perf_counter(); float(run1(xs4)); t1 = time.perf_counter()
    t2 = time.perf_counter(); float(run4(xs4)); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / 3.0


def main():
    from sparenet_tpu.ops.mds import _mds_batched

    rs = np.random.RandomState(0)
    xs4 = jnp.asarray(rs.rand(4, B, N, 3).astype(np.float32) - 0.5)
    mml = jnp.full((B,), 0.12, jnp.float32)

    configs = [("G=8192", dict(g=8192)),
               ("G=6144", dict(g=6144)),
               ("G=4096", dict(g=4096)),
               ("G=2048", dict(g=2048)),
               ("S=2048", dict(g=8192, schedule=(2048,))),
               ("S=4096", dict(g=8192, schedule=(4096,))),
               ("S=2048,4096", dict(g=8192, schedule=(2048, 4096))),
               ("S=1024,2048,4096", dict(g=8192,
                                         schedule=(1024, 2048, 4096)))]
    for name, kw in configs:
        def f(x, kw=kw):
            idx, sel = _mds_batched(x, NPOINT, mml, return_xyz=True, **kw)
            return jnp.sum(sel[:, ::257, 0]) + jnp.float32(
                jnp.sum(idx[:, ::511]))
        dt = slope(f, xs4, mml)
        print(f"  {name:18s}: {dt*1000:7.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
