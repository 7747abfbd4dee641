"""Isolate the schedule configs' unexplained overhead.

The piece budget (profile_mds_pieces.py, docs/artifacts/r5/stage4b)
prices selection at ~0-1.4 ms (ANY arm, any take — the stage-3
"top_k k-dependence" was the mispriced component profiler), updates at
~1.2 us/covered-point, gathers at ~0.2 us/row. An additive model from
those pieces reproduces EVERY fixed-G config cost (G=8192 15.3,
G=6144 19.3, G=4096 23.7, G=2048 26.0) but UNDERSHOOTS every schedule
config by ~9-12 ms (S=4096 predicted ~11, measured 21.0). These
variants bisect where the overhead lives: final-round size, the
out/out_xyz assembly, or return_xyz.

Run ON TPU in background:  python scripts/r5/profile_sched_overhead.py
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


def slope(fn, xs4):
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

    variants = [
        ("G=8192  xyz", dict(g=8192), True),
        ("G=8192  idx-only", dict(g=8192), False),
        ("S=4096  xyz", dict(g=8192, schedule=(4096,)), True),
        ("S=4096  idx-only", dict(g=8192, schedule=(4096,)), False),
        ("S=12288 xyz (big round FIRST, small final)",
         dict(g=8192, schedule=(12288,)), True),
        ("S=8192  xyz (== G=8192 rounds via schedule path)",
         dict(g=8192, schedule=(8192,)), True),
    ]
    for name, kw, ret in variants:
        def f(x, kw=kw, ret=ret):
            if ret:
                idx, sel = _mds_batched(x, NPOINT, mml, return_xyz=True,
                                        **kw)
                return (jnp.sum(sel[:, ::257, 0])
                        + jnp.float32(jnp.sum(idx[:, ::511])))
            idx = _mds_batched(x, NPOINT, mml, **kw)
            return jnp.float32(jnp.sum(idx[:, ::511]))
        dt = slope(f, xs4)
        print(f"  {name:44s}: {dt*1000:7.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
