"""Encoder tail microbench: conv5 (2048->2048 over 3000 pts) + BN +
leaky + max/avg pools + bottleneck Linear/BN/relu, at bench precision."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")


def timed(name, fn, reps=5):
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    rs = np.random.RandomState(0)
    B, N = 32, 3000
    xc = jnp.asarray(rs.rand(B, N, 2048) - 0.5, jnp.float32)
    w5 = jnp.asarray(rs.rand(2048, 2048) * 0.02, jnp.float32)
    a = jnp.asarray(rs.rand(2048) + 0.5, jnp.float32)
    b = jnp.asarray(rs.rand(2048) * 0.1, jnp.float32)
    wl = jnp.asarray(rs.rand(4096, 4096) * 0.02, jnp.float32)

    timed("conv5 matmul alone", jax.jit(
        lambda x: jnp.sum(x @ w5)).__call__ if False else
        (lambda f=jax.jit(lambda x: jnp.sum(x @ w5)): f(xc)))

    def tail(x):
        h = x @ w5
        h = a * h + b
        h = jax.nn.leaky_relu(h, 0.2)
        mx = jnp.max(h, axis=1)
        av = jnp.mean(h, axis=1)
        y = jnp.concatenate([mx, av], axis=-1)
        y = y @ wl
        return jnp.sum(jax.nn.relu(a.repeat(2) * y + b.repeat(2)))
    f_tail = jax.jit(tail)
    timed("conv5 + BN + pools + bottleneck", lambda: f_tail(xc))


if __name__ == "__main__":
    main()
