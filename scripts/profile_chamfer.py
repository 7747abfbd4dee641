"""A/B: Pallas NN kernel vs chunked-XLA chamfer at training shapes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, reps=4):
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    from sparenet_tpu.ops.chamfer import _nn_one, chamfer_raw
    from sparenet_tpu.ops.pallas.chamfer_pallas import nn_idx_pallas

    rs = np.random.RandomState(0)
    for B, N, M in [(8, 16384, 16384), (32, 16384, 3000)]:
        x = jnp.asarray(rs.rand(B, N, 3), jnp.float32)
        y = jnp.asarray(rs.rand(B, M, 3), jnp.float32)

        f_xla = jax.jit(lambda x, y: jnp.sum(
            jax.vmap(_nn_one)(x, y)[0]))
        f_pal = jax.jit(lambda x, y: jnp.sum(nn_idx_pallas(x, y)))
        # index agreement
        _, i_ref = jax.vmap(_nn_one)(x, y)
        i_pal = nn_idx_pallas(x, y)
        agree = float(jnp.mean((i_ref == i_pal).astype(jnp.float32)))
        print(f"[B={B} N={N} M={M}] index agreement {agree*100:.4f}%")
        timed(f"  XLA chunked NN", lambda: f_xla(x, y))
        timed(f"  Pallas NN kernel", lambda: f_pal(x, y))

        f_cd = jax.jit(lambda a, b: sum(
            jnp.sum(t) for t in chamfer_raw(a, b)[:2]))
        timed(f"  full chamfer_raw (dispatched)", lambda: f_cd(x, y))


if __name__ == "__main__":
    main()
