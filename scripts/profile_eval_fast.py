"""Slope-timed A/B of the eval-mode EdgeConv fast path (EVAL_FAST).

Times the full EdgeConvResFeat encoder at production shape with the
dense [B,N,k,C] edge-tensor path vs the neighborhood-extrema
formulation, plus the full SpareNet forward both ways, and checks the
outputs agree. Slope method: (t_R - t_1) / (R - 1) removes dispatch
overhead.
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


def slope(name, build, inputs, reps=3):
    f1, fh = build(1), build(R_HI)
    float(f1(inputs[:1]))
    float(fh(inputs[:R_HI]))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(inputs[:1]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(inputs[:R_HI]))
        ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:44s} {per * 1000:8.1f} ms", flush=True)
    return per


def main():
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.models.layers import EdgeConvResFeat
    from sparenet_tpu.ops import common as opc

    B = int(os.environ.get("B", "32"))
    rs = np.random.RandomState(0)
    xs = [jnp.asarray(rs.rand(B, 3000, 3) - 0.5, jnp.float32)
          for _ in range(R_HI)]

    enc = EdgeConvResFeat(hide_size=4096, output_size=4096,
                          use_selayer=True, train=False)
    ev = enc.init({"params": jax.random.PRNGKey(0)}, xs[0])

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, xs[0])

    results = {}
    for fast in (False, True):
        opc.EVAL_FAST = fast
        tag = "fast" if fast else "dense"

        def make_enc(r):
            jf = jax.jit(lambda v, xl: sum(
                jnp.sum(enc.apply(v, x)) for x in xl))
            return lambda xl: jf(ev, xl)
        slope(f"encoder [{tag}]", make_enc, xs)

        def make_full(r):
            jf = jax.jit(lambda v, xl: sum(
                jnp.sum(model.apply(v, x)[2]) for x in xl))
            return lambda xl: jf(mv, xl)
        t = slope(f"FULL forward [{tag}]", make_full, xs)
        print(f"  -> {B / t:.1f} clouds/sec/chip [{tag}]", flush=True)

        results[tag] = float(jax.jit(
            lambda v, x: jnp.sum(enc.apply(v, x)))(ev, xs[0]))

    rel = abs(results["fast"] - results["dense"]) / (
        abs(results["dense"]) + 1e-9)
    print(f"encoder checksum dense={results['dense']:.6g} "
          f"fast={results['fast']:.6g} rel={rel:.2e}")


if __name__ == "__main__":
    main()
