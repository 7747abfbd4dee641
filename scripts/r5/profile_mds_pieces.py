"""Piece-level budget of _mds_batched at the production shape: selection
(sort vs topk at each round size), the dot-form exp2 density update,
and the per-round xyz gathers — measured SEPARATELY by slope timing so
the config-level differences (G=8192 benches 256.5, S=4096 234.7 —
despite HALF the update work) can be attributed.

Run ON TPU in background:  python scripts/r5/profile_mds_pieces.py
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

B, N = 32, 19456


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
    from sparenet_tpu.ops.mds import (_round_pick, _select_smallest_sort)

    rs = np.random.RandomState(0)
    temps4 = jnp.asarray(rs.rand(4, B, N).astype(np.float32) * 100)
    xs4 = jnp.asarray(rs.rand(4, B, N, 3).astype(np.float32) - 0.5)

    print("== selection at each round size ==", flush=True)
    for take in (4096, 8192, 12287):
        for arm in ("sort", "topk", "pack16"):
            def f(t, take=take, arm=arm):
                idx = _round_pick(t, take, arm)
                return jnp.float32(jnp.sum(idx[:, ::173]))
            dt = slope(f, temps4)
            print(f"  select {arm:5s} take={take:5d}: {dt*1000:7.2f} ms",
                  flush=True)

    print("== dot-form exp2 update at each covered size ==", flush=True)
    kde = jnp.full((B, 1), 7.3, jnp.float32)
    for g in (4096, 8192):
        def f(x, g=g):
            s = x[:, :g]                          # stand-in selected rows
            bias = -jnp.sum(x * x, -1) * kde
            arg = (jnp.einsum("bnd,bgd->bng", x,
                              2.0 * kde[..., None] * s)
                   + bias[..., None]
                   - (jnp.sum(s * s, -1) * kde)[:, None, :])
            return jnp.float32(jnp.sum(jnp.exp2(arg)))
        dt = slope(f, xs4)
        print(f"  update covered={g:5d}: {dt*1000:7.2f} ms", flush=True)

    print("== xyz row gather at each take ==", flush=True)
    idx_all = jnp.asarray(
        np.stack([rs.permutation(N)[:14336] for _ in range(B)]).astype(
            np.int32))
    for take in (8192, 12287):
        idx = idx_all[:, :take]
        def f(x, idx=idx):
            rows = jnp.take_along_axis(x, idx[..., None], axis=1)
            return jnp.float32(jnp.sum(rows[:, ::97]))
        dt = slope(f, xs4)
        print(f"  gather take={take:5d}: {dt*1000:7.2f} ms", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
