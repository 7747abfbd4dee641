"""Slope-timed encoder internals: per-stage edge path (given idx),
gather+max alone, conv5 tail, kNN selection vs distance, precision
ablations. All numbers are per-rep slopes (dispatch overhead removed).
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

jax.config.update("jax_default_matmul_precision", "bfloat16")

R_HI = 4


def slope(name, jf, inputs, reps=3):
    f1 = lambda: float(jf(inputs[:1]))
    fh = lambda: float(jf(inputs[:R_HI]))
    f1(); fh()
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); f1(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fh(); ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:52s} slope {per*1000:8.1f} ms", flush=True)
    return per


def main():
    from sparenet_tpu.ops.knn import knn_idx
    from sparenet_tpu.ops.pallas.knn_pallas import knn_self_pallas
    from sparenet_tpu.ops import common

    rs = np.random.RandomState(0)
    B, N, k = 32, 3000, 8
    h = 4096

    # per-stage edge path (idx given): EdgeConv gather+add, BN(eval
    # affine), SE, leaky, max — mimics EdgeConvResFeat.stage
    for cin, cout in ((3, 256), (256, 256), (256, 512), (512, 1024)):
        xsets = [(jnp.asarray(rs.rand(B, N, cin) - 0.5, jnp.float32),
                  jnp.asarray(rs.randint(0, N, (B, N, k)), jnp.int32))
                 for _ in range(R_HI)]
        w1 = jnp.asarray(rs.rand(cin, cout) * 0.05, jnp.float32)
        w2 = jnp.asarray(rs.rand(cin, cout) * 0.05, jnp.float32)
        a = jnp.asarray(rs.rand(cout) + 0.5, jnp.float32)
        bb = jnp.asarray(rs.rand(cout) * 0.1, jnp.float32)

        @jax.jit
        def stage_f(sets, w1=w1, w2=w2, a=a, bb=bb):
            tot = 0.0
            for x, idx in sets:
                g1 = x @ w1
                g2 = x @ w2
                gj = jnp.take_along_axis(
                    g1[:, :, None, :], idx[..., None], axis=1)
                e = gj + (g2 - g1)[:, :, None, :]
                e = a * e + bb
                # SE (eval): per-(b,c) sigmoid scale from global mean
                s = jax.nn.sigmoid(jnp.mean(e, axis=(1, 2)))
                e = e * s[:, None, None, :]
                e = jax.nn.leaky_relu(e, 0.2)
                tot += jnp.sum(jnp.max(e, axis=2))
            return tot
        slope(f"edge stage {cin}->{cout} (given idx)", stage_f, xsets)

        @jax.jit
        def gmax_f(sets, w1=w1):
            tot = 0.0
            for x, idx in sets:
                g1 = x @ w1
                gj = jnp.take_along_axis(
                    g1[:, :, None, :], idx[..., None], axis=1)
                tot += jnp.sum(jnp.max(gj, axis=2))
            return tot
        slope(f"  gather+max only {cin}->{cout}", gmax_f, xsets)

    # conv5 + pools tail
    xc = [jnp.asarray(rs.rand(B, N, 2048) - 0.5, jnp.float32)
          for _ in range(R_HI)]
    w5 = jnp.asarray(rs.rand(2048, 2048) * 0.02, jnp.float32)

    @jax.jit
    def tail_f(xs):
        tot = 0.0
        for x in xs:
            hx = jax.nn.leaky_relu(x @ w5, 0.2)
            tot += jnp.sum(jnp.max(hx, axis=1)) + jnp.sum(jnp.mean(hx, axis=1))
        return tot
    slope("conv5 2048->2048 + pools", tail_f, xc)

    # kNN per stage width, HIGHEST vs DEFAULT
    for c in (3, 256, 512):
        feats = [jnp.asarray(rs.rand(B, N, c), jnp.float32)
                 for _ in range(R_HI)]
        jf = jax.jit(lambda fs: sum(jnp.sum(knn_self_pallas(f, 8))
                                    for f in fs))
        slope(f"kNN C={c} [HIGHEST]", jf, feats)
        jax.clear_caches()
        common.set_distance_precision("DEFAULT")
        jf2 = jax.jit(lambda fs: sum(jnp.sum(knn_self_pallas(f, 8))
                                     for f in fs))
        slope(f"kNN C={c} [DEFAULT]", jf2, feats)
        common.set_distance_precision("HIGHEST")
        jax.clear_caches()


if __name__ == "__main__":
    main()
