"""A/B: current encoder stage (BN -> SE -> leaky -> max over the
[B,N,k,C] edge tensor) vs a reduction-first rewrite that never
materializes the edge tensor (max/min/mean fused into the producer,
affine BN + SE + leaky applied on the k-reduced [B,N,C] tensor).

Equivalence: max_k(leaky(se*(a*e+b))) = leaky(se * (a*max_k(e)+b)) for
a>0 (min_k for a<0), since leaky_relu and nonneg scaling are monotone;
SE's mean(BN(e)) = a*mean(e)+b per channel. Eval-mode BN (bench path).
"""

from __future__ import annotations

import argparse
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
        # eval-mode BN affine (some negative scales to exercise the
        # min/max select) + SE weights
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
            e = gj + (g2 - g1)[:, :, None, :]            # [B,N,k,C]
            e = a * e + bsh                              # BN eval
            y = jax.nn.sigmoid(
                jax.nn.relu(jnp.mean(e, axis=(1, 2)) @ w1) @ w2)
            e = e * y[:, None, None, :]                  # SE
            e = jax.nn.leaky_relu(e, 0.2)
            return jnp.sum(jnp.max(e, axis=2))

        def fused(x, idx):
            c = x.shape[-1]
            g1 = x @ w[:c]
            g2 = x @ w[c:]
            gj = jnp.take_along_axis(g1[:, :, None, :], idx[..., None],
                                     axis=1)
            e = gj + (g2 - g1)[:, :, None, :]
            mx = jnp.max(e, axis=2)                      # [B,N,C]
            mn = jnp.min(e, axis=2)
            em = jnp.mean(e, axis=(1, 2))                # [B,C]
            bn_mean = a * em + bsh
            y = jax.nn.sigmoid(jax.nn.relu(bn_mean @ w1) @ w2)
            red = jnp.where(a > 0, mx, mn)
            out = (a * red + bsh) * y[:, None, :]
            return jnp.sum(jax.nn.leaky_relu(out, 0.2))

        fc = jax.jit(current)
        ff = jax.jit(fused)
        va = float(fc(x, idx))
        vb = float(ff(x, idx))
        rel = abs(va - vb) / max(abs(va), 1e-6)
        print(f"stage {cin:4d}->{cout:4d} parity rel err {rel:.2e}")
        timed(f"  current  {cin}->{cout}", lambda: fc(x, idx))
        timed(f"  fused    {cin}->{cout}", lambda: ff(x, idx))


if __name__ == "__main__":
    main()
