"""A/B microbench: f32 vs bf16 activations for the HBM-bound model
stages (decoder fold stage, EdgeConv edge tensor, refine residual net),
at bench scale. Motivation: the forward is HBM-bandwidth-bound in
several stages ([P,B,S,1026] decoder activations = 2.15 GB f32 per
pass; [B,N,k,C] edge tensors up to 3.1 GB); bf16 halves the traffic."""

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
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    rs = np.random.RandomState(0)
    P, B, S = 32, 32, 512
    N, k = 3000, 8

    # ---- decoder stage: conv 1026 -> 1026 + AdaIN + BN(eval) + relu
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rs.rand(P, B, S, 514) - 0.5, dt)
        w = jnp.asarray(rs.rand(514, 1026) * 0.02, dt)
        aw = jnp.asarray(rs.rand(P, B, 1026), jnp.float32)
        ab = jnp.asarray(rs.rand(P, B, 1026), jnp.float32)

        def stage(x, w, aw, ab):
            h = x @ w
            m = jnp.mean(h.astype(jnp.float32), axis=2, keepdims=True)
            v = jnp.mean(
                jnp.square(h.astype(jnp.float32) - m), axis=2, keepdims=True)
            hn = (h - m.astype(h.dtype)) * jax.lax.rsqrt(
                v + 1e-5).astype(h.dtype)
            hn = hn * aw[:, :, None].astype(h.dtype) + \
                ab[:, :, None].astype(h.dtype)
            return jnp.sum(jax.nn.relu(hn).astype(jnp.float32))

        f = jax.jit(stage)
        timed(f"decoder stage 514->1026 +adain+relu [{dt.__name__}]",
              lambda f=f, x=x, w=w: float(f(x, w, aw, ab)))

    # ---- edge stage: gather + add + BN(eval affine) + leaky + max over k
    idx = jnp.asarray(rs.randint(0, N, (B, N, k)), jnp.int32)
    for dt in (jnp.float32, jnp.bfloat16):
        g1 = jnp.asarray(rs.rand(B, N, 1024) - 0.5, dt)
        g2 = jnp.asarray(rs.rand(B, N, 1024) - 0.5, dt)
        a = jnp.asarray(rs.rand(1024) + 0.5, dt)
        b = jnp.asarray(rs.rand(1024) * 0.1, dt)

        def edge(g1, g2, idx, a, b):
            gj = jnp.take_along_axis(
                g1[:, :, None, :], idx[..., None], axis=1)
            e = gj + (g2 - g1)[:, :, None, :]
            e = a * e + b
            e = jax.nn.leaky_relu(e, 0.2)
            return jnp.sum(jnp.max(e, axis=2).astype(jnp.float32))

        f = jax.jit(edge)
        timed(f"edge stage C=1024 gather+affine+max [{dt.__name__}]",
              lambda f=f, g1=g1, g2=g2, a=a, b=b: float(f(g1, g2, idx, a, b)))

    # ---- refine residual net core: N=16384 convs 4->64->128->1024
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rs.rand(B, 16384, 4) - 0.5, dt)
        w1 = jnp.asarray(rs.rand(4, 64) * 0.02, dt)
        w2 = jnp.asarray(rs.rand(64, 128) * 0.02, dt)
        w3 = jnp.asarray(rs.rand(128, 1024) * 0.02, dt)

        def res(x, w1, w2, w3):
            h = jax.nn.relu(x @ w1)
            h = jax.nn.relu(h @ w2)
            h = h @ w3
            g = jnp.max(h, axis=1)
            return jnp.sum(g.astype(jnp.float32))

        f = jax.jit(res)
        timed(f"residual core N=16384 4->64->128->1024 [{dt.__name__}]",
              lambda f=f, x=x: float(f(x, w1, w2, w3)))


if __name__ == "__main__":
    main()
