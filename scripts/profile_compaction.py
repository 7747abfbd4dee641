"""Which lane-compaction glue is cheapest on TPU at [32, 19456]?

Variants: (a) 5 separate scatters, (b) one packed [B, N, 5] scatter,
(c) variadic lax.sort with an order-encoding key, (d) argsort + gathers.
All produce live-lanes-first order-stable compaction.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rs = np.random.RandomState(0)
    b, n = 32, 19456
    ns_next = 11264
    dead = jnp.asarray(rs.rand(b, n) < 0.42)
    arrs = [jnp.asarray(rs.rand(b, n), jnp.float32) for _ in range(4)]
    orig = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    batch_ids = jnp.arange(b)[:, None]

    @jax.jit
    def scatter5(dead, a0, a1, a2, a3, orig):
        live = ~dead
        pos = jnp.cumsum(live.astype(jnp.int32), axis=-1) - 1
        tgt = jnp.where(live, pos, ns_next)
        outs = [jnp.zeros((b, ns_next), jnp.float32).at[
            batch_ids, tgt].set(a, mode="drop") for a in (a0, a1, a2, a3)]
        oo = jnp.full((b, ns_next), -1, jnp.int32).at[
            batch_ids, tgt].set(orig, mode="drop")
        return sum(jnp.sum(o) for o in outs) + jnp.sum(oo)

    @jax.jit
    def packed(dead, a0, a1, a2, a3, orig):
        live = ~dead
        pos = jnp.cumsum(live.astype(jnp.int32), axis=-1) - 1
        tgt = jnp.where(live, pos, ns_next)
        stacked = jnp.stack(
            [a0, a1, a2, a3, orig.astype(jnp.float32)], axis=-1)
        out = jnp.zeros((b, ns_next, 5), jnp.float32).at[
            batch_ids[..., None], tgt[..., None],
            jnp.arange(5)[None, None]].set(stacked, mode="drop")
        return jnp.sum(out)

    @jax.jit
    def vsort(dead, a0, a1, a2, a3, orig):
        key = jnp.where(dead, 1 << 20, 0) + orig
        k, o0, o1, o2, o3, oo = jax.lax.sort(
            (key, a0, a1, a2, a3, orig), dimension=-1, num_keys=1)
        outs = [o[:, :ns_next] for o in (o0, o1, o2, o3)]
        return sum(jnp.sum(o) for o in outs) + jnp.sum(oo[:, :ns_next])

    @jax.jit
    def argsort_gather(dead, a0, a1, a2, a3, orig):
        key = jnp.where(dead, 1 << 20, 0) + orig
        order = jnp.argsort(key, axis=-1)[:, :ns_next]
        outs = [jnp.take_along_axis(a, order, axis=1)
                for a in (a0, a1, a2, a3)]
        oo = jnp.take_along_axis(orig, order, axis=1)
        return sum(jnp.sum(o) for o in outs) + jnp.sum(oo)

    for name, f in [("scatter x5", scatter5), ("packed scatter", packed),
                    ("variadic sort", vsort),
                    ("argsort+gathers", argsort_gather)]:
        args = (dead, *arrs, orig)
        float(f(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:18s} {min(ts)*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
