"""Slope-based stage timing: true on-device cost of each forward stage,
free of the axon tunnel's ~40 ms per-dispatch overhead.

Method: jit a program that runs a stage R times on R different inputs
(summing scalar outputs so nothing is DCE'd), measure wall time at
R=1 and R=R_HI with one sync each; the slope (t_hi - t_lo)/(R_hi - 1)
is the per-rep device cost. XLA runs the repetitions sequentially on
the single TensorCore, so the slope is additive cost, not throughput
of an overlapped bundle.
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

R_HI = 4


def slope(name, make_fn, inputs, reps=3):
    """make_fn(r) -> jitted fn taking a list of r input pytrees."""
    f1 = make_fn(1)
    fh = make_fn(R_HI)
    float(f1(inputs[:1]))
    float(fh(inputs[:R_HI]))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(inputs[:1]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(inputs[:R_HI]))
        ths.append(time.perf_counter() - t0)
    t1, th = min(t1s), min(ths)
    per = (th - t1) / (R_HI - 1)
    print(f"{name:44s} slope {per*1000:8.1f} ms   (t1 {t1*1000:7.1f}, "
          f"t{R_HI} {th*1000:7.1f})", flush=True)
    return per


def main():
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.ops.knn import knn_idx
    from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas
    from sparenet_tpu.ops.expansion_penalty import expansion_penalty

    rs = np.random.RandomState(0)
    B, N = 32, 3000

    xs = [jnp.asarray(rs.rand(B, N, 3) - 0.5, jnp.float32) for _ in range(R_HI)]

    # full model
    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, xs[0])

    def make_full(r):
        jf = jax.jit(lambda v, xlist: sum(
            jnp.sum(model.apply(v, x)[2]) for x in xlist))
        return lambda xlist: jf(mv, xlist)
    slope("full SpareNet fwd", make_full, xs)

    # encoder
    enc = EdgeConvResFeat(use_selayer=True, train=False)
    ev = enc.init({"params": jax.random.PRNGKey(0)}, xs[0])

    def make_enc(r):
        jf = jax.jit(lambda v, xlist: sum(
            jnp.sum(enc.apply(v, x)) for x in xlist))
        return lambda xlist: jf(ev, xlist)
    slope("encoder", make_enc, xs)

    # 4 kNN graphs at stage widths
    h = 4096
    widths = [3, h // 16, h // 16, h // 8]
    featsets = [[jnp.asarray(rs.rand(B, N, c), jnp.float32) for c in widths]
                for _ in range(R_HI)]

    def make_knn(r):
        @jax.jit
        def f(fsets):
            return sum(jnp.sum(knn_idx(f_, 8)) for fs in fsets for f_ in fs)
        return f
    slope("4x kNN graphs", make_knn, featsets)

    # MDS at production shape
    clouds = [jnp.asarray(rs.rand(B, 19384, 3), jnp.float32)
              for _ in range(R_HI)]
    mml = jnp.full((B,), 0.05, jnp.float32)

    def make_mds(r):
        @jax.jit
        def f(cs):
            return sum(jnp.sum(mds_pallas(c, 16384, mml)) for c in cs)
        return f
    slope("MDS 16384-of-19384", make_mds, clouds)

    # expansion penalty at production shape
    coarse = [jnp.asarray(rs.rand(B, 16384, 3) - 0.5, jnp.float32)
              for _ in range(R_HI)]

    def make_exp(r):
        @jax.jit
        def f(cs):
            return sum(jnp.sum(expansion_penalty(c, 512, 1.5)[0]) for c in cs)
        return f
    slope("expansion penalty", make_exp, coarse)


if __name__ == "__main__":
    main()
