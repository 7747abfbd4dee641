"""A/B: edge-stage via 8 rolled gathers + running max/min/sum (never
materializing [B,N,k,C]) vs the current take_along_axis 4D path.

Algebra: e = gj + c with c = (g2-g1)[:, :, None, :] broadcast over k, so
max_k(e) = max_k(gj) + c, and the BN/SE/leaky chain commutes with the
k-reduction via the affine-sign select (see profile_stage_fusion.py).
Eval-mode BN chain included in both variants for end-to-end parity.
"""

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
    print(f"{name:40s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    from sparenet_tpu.ops.knn import knn_idx

    rs = np.random.RandomState(0)
    B, N, k = 32, 3000, 8
    stages = [(3, 256), (256, 256), (256, 512), (512, 1024)]

    for cin, cout in stages:
        x = jnp.asarray(rs.rand(B, N, cin) - 0.5, jnp.float32)
        w = jnp.asarray(rs.rand(2 * cin, cout) * 0.02, jnp.float32)
        a = jnp.asarray(rs.randn(cout) * 0.5, jnp.float32)
        bsh = jnp.asarray(rs.randn(cout) * 0.1, jnp.float32)
        w1 = jnp.asarray(rs.rand(cout, cout // 16) * 0.1, jnp.float32)
        w2 = jnp.asarray(rs.rand(cout // 16, cout) * 0.1, jnp.float32)
        idx = jax.block_until_ready(knn_idx(x, k))

        def current(x, idx):
            c = x.shape[-1]
            g1 = x @ w[:c]
            g2 = x @ w[c:]
            gj = jnp.take_along_axis(g1[:, :, None, :], idx[..., None],
                                     axis=1)
            e = gj + (g2 - g1)[:, :, None, :]
            e = a * e + bsh
            y = jax.nn.sigmoid(
                jax.nn.relu(jnp.mean(e, axis=(1, 2)) @ w1) @ w2)
            e = e * y[:, None, None, :]
            e = jax.nn.leaky_relu(e, 0.2)
            return jnp.sum(jnp.max(e, axis=2))

        def gathers(x, idx):
            c = x.shape[-1]
            g1 = x @ w[:c]
            g2 = x @ w[c:]
            g0 = jnp.take_along_axis(g1, idx[:, :, 0, None].repeat(
                g1.shape[-1], -1), axis=1)
            mx = g0
            mn = g0
            sm = g0
            for j in range(1, k):
                gj = jnp.take_along_axis(g1, idx[:, :, j, None].repeat(
                    g1.shape[-1], -1), axis=1)
                mx = jnp.maximum(mx, gj)
                mn = jnp.minimum(mn, gj)
                sm = sm + gj
            cc = g2 - g1
            # SE mean over (N, k) of BN(e): affine of mean(e)
            em = jnp.mean(sm / k + cc, axis=1)
            bn_mean = a * em + bsh
            y = jax.nn.sigmoid(jax.nn.relu(bn_mean @ w1) @ w2)
            red = jnp.where(a > 0, mx, mn) + cc
            out = (a * red + bsh) * y[:, None, :]
            return jnp.sum(jax.nn.leaky_relu(out, 0.2))

        fc = jax.jit(current)
        fg = jax.jit(gathers)
        va, vb = float(fc(x, idx)), float(fg(x, idx))
        rel = abs(va - vb) / max(abs(va), 1e-6)
        print(f"stage {cin:4d}->{cout:4d} parity rel err {rel:.2e}")
        timed(f"  current 4D  {cin}->{cout}", lambda: fc(x, idx))
        timed(f"  8-gathers   {cin}->{cout}", lambda: fg(x, idx))


if __name__ == "__main__":
    main()
