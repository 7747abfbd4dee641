"""Serving-mode encoder decomposition at bench scale (B=32, N=3000).

Slope-times the EdgeConvResFeat sub-blocks UNDER SPARENET_FAST_MATH=1
(bf16 chains, DEFAULT graph precision, ENC_COMMUTE on) to attribute the
~89 ms encoder cost: per-stage knn, per-stage commute gather+max, the
4-stage block, conv5 tail, pooling, and the bottleneck head.

Run on the TPU with SPARENET_FAST_MATH=1 (background, natural
completion).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
assert os.environ.get("SPARENET_FAST_MATH") == "1", "run with SPARENET_FAST_MATH=1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")

B = int(os.environ.get("B", "32"))
N = int(os.environ.get("N", "3000"))
R_HI = 4
STAGES = [(3, 256), (256, 256), (256, 512), (512, 1024)]


def slope(name, fn, xs, reps=3):
    cut = lambda s, r: jax.tree_util.tree_map(lambda t: t[:r], s)
    f1 = jax.jit(lambda s: fn(cut(s, 1)))
    fh = jax.jit(lambda s: fn(cut(s, R_HI)))
    float(f1(xs)); float(fh(xs))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(xs)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(xs)); ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:52s} {per * 1000:8.1f} ms", flush=True)
    return per


def scan_sum(body):
    def run(stack):
        def step(acc, inp):
            return acc + body(inp), None
        out, _ = jax.lax.scan(step, jnp.float32(0), stack)
        return out
    return run


def main():
    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.models.sparenet import SpareNetEncode
    from sparenet_tpu.ops.knn import knn_idx

    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.rand(R_HI, B, N, 3) - 0.5, jnp.float32)

    enc = SpareNetEncode(bottleneck_size=4096, hide_size=4096,
                         use_selayer=True, encode="Residualnet", train=False)
    ev = enc.init({"params": jax.random.PRNGKey(0)}, xs[0])
    slope("SpareNetEncode full", scan_sum(
        lambda x: jnp.sum(enc.apply(ev, x))), xs)

    ecf = EdgeConvResFeat(hide_size=4096, output_size=4096,
                          use_selayer=True, train=False)
    ecv = ecf.init({"params": jax.random.PRNGKey(0)}, xs[0])
    slope("EdgeConvResFeat (4 stages + tail)", scan_sum(
        lambda x: jnp.sum(ecf.apply(ecv, x))), xs)

    # per-stage: knn at serving precision + commute gather on random feats
    for ci, co in STAGES:
        fs = jnp.asarray(rs.rand(R_HI, B, N, ci) - 0.5, jnp.float32)
        slope(f"  knn (C={ci}, serving prec)", scan_sum(
            lambda x: jnp.sum(knn_idx(x, k=8).astype(jnp.float32))), fs)

        w = jnp.asarray(rs.rand(ci, co) * 0.05, jnp.float32)
        a = jnp.asarray(rs.randn(co) * 0.5, jnp.float32)
        idx_fn = jax.jit(jax.vmap(lambda x: knn_idx(x, k=8)))
        idxs = idx_fn(fs)

        def commute_gm(inp, co=co, w=w, a=a):
            x, idx = inp
            g1s = ((x @ w) * a).astype(jnp.bfloat16)
            gj = jnp.take_along_axis(g1s[:, :, None, :], idx[..., None],
                                     axis=1)
            m = jnp.max(gj, axis=2).astype(jnp.float32)
            mean_gj = jnp.mean(gj.astype(jnp.float32), axis=(1, 2))
            return jnp.sum(m) + jnp.sum(mean_gj)
        slope(f"  commute gather+max+mean (C={co})", scan_sum(commute_gm),
              (fs, idxs))

    # conv5 tail on the concat width
    h = 4096
    xc = jnp.asarray(rs.rand(R_HI, B, N, h // 2) - 0.5, jnp.float32)
    w5 = jnp.asarray(rs.rand(h // 2, h // 2) * 0.02, jnp.float32)

    def tail(x):
        y = (x @ w5).astype(jnp.bfloat16)
        y = y * 1.01 + 0.02                      # bn eval affine stand-in
        y = jnp.where(y >= 0, y, 0.2 * y)
        xmax = jnp.max(y, axis=1).astype(jnp.float32)
        xavg = jnp.mean(y, axis=1, dtype=jnp.float32)
        return jnp.sum(xmax) + jnp.sum(xavg)
    slope("conv5 tail + pools (bf16)", scan_sum(tail), xc)

    # bottleneck head: Linear(4096) on pooled [B, 4096]
    pooled = jnp.asarray(rs.rand(R_HI, B, h) - 0.5, jnp.float32)
    wb = jnp.asarray(rs.rand(h, 4096) * 0.01, jnp.float32)
    slope("bottleneck head", scan_sum(
        lambda p: jnp.sum(jnp.maximum(p @ wb, 0.0))), pooled)


if __name__ == "__main__":
    main()
