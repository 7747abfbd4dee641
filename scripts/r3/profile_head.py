"""Serving-forward decomposition at round-3 HEAD (after the fused
Pallas gather+max and packed-key kNN landed) — names the next perf
tier with evidence instead of round-2's stale budget.

Run ON TPU (background, natural completion):
  SPARENET_FAST_MATH=1 python scripts/r3/profile_head.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
assert os.environ.get("SPARENET_FAST_MATH") == "1", \
    "run with SPARENET_FAST_MATH=1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")

R_HI = 4
B = int(os.environ.get("B", "32"))
N = 3000


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
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.models.sparenet import (
        SpareNetDecode, SpareNetEncode, SpareNetRefine)
    from sparenet_tpu.ops.knn import knn_idx
    from sparenet_tpu.ops.pallas.gather_pallas import gather_rows_max

    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.rand(R_HI, B, N, 3) - 0.5, jnp.float32)

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    mv = model.init({"params": jax.random.PRNGKey(0)}, xs[0])
    t_full = slope("FULL forward (serving)", scan_sum(
        lambda x: jnp.sum(model.apply(mv, x)[2])), xs)
    print(f"  -> {B / t_full:.1f} clouds/s/chip", flush=True)

    enc = SpareNetEncode(bottleneck_size=4096, hide_size=4096,
                         use_selayer=True, encode="Residualnet", train=False)
    ev = enc.init({"params": jax.random.PRNGKey(0)}, xs[0])
    slope("encoder (incl bottleneck)", scan_sum(
        lambda x: jnp.sum(enc.apply(ev, x))), xs)

    styles = jnp.asarray(rs.rand(R_HI, B, 4096), jnp.float32)
    dec = SpareNetDecode(num_points=16384, n_primitives=32,
                         bottleneck_size=4096, use_adain="share",
                         use_selayer=True, train=False)
    dv = dec.init({"params": jax.random.PRNGKey(0)}, styles[0])
    slope("decoder", scan_sum(lambda s: jnp.sum(dec.apply(dv, s))), styles)

    coarse = jax.jit(lambda v, x: model.apply(v, x)[0])(mv, xs[0])
    coarses = jnp.stack([coarse + 1e-4 * i for i in range(R_HI)])
    ref = SpareNetRefine(num_points=16384, n_primitives=32,
                         use_selayer=True, train=False)
    refv = ref.init(jax.random.PRNGKey(0), coarses[0], xs[0])
    slope("refine x1", scan_sum(
        lambda inp: jnp.sum(ref.apply(refv, inp[0], inp[1])[0])),
        (coarses, xs))

    # encoder internals at HEAD: packed kNN + pallas gather per stage
    for ci, co in [(3, 256), (256, 256), (256, 512), (512, 1024)]:
        fs = jnp.asarray(rs.rand(R_HI, B, N, ci) - 0.5, jnp.float32)
        slope(f"  knn C={ci} (packed)", scan_sum(
            lambda x: jnp.sum(knn_idx(x, k=8).astype(jnp.float32))), fs)
        gs = jnp.asarray(rs.rand(R_HI, B, N, co) - 0.5, jnp.float32)
        idx = jax.jit(jax.vmap(lambda x: knn_idx(x, k=8)))(fs)
        slope(f"  pallas gather+max+sum C={co}", scan_sum(
            lambda inp: sum(jnp.sum(o.astype(jnp.float32)) for o in
                            gather_rows_max(inp[0], inp[1], need_sum=True))),
            (gs, idx))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
