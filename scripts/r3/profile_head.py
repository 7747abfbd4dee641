"""Serving-forward decomposition at round-3 HEAD (after the fused
Pallas gather+max and packed-key kNN landed) — names the next perf
tier with evidence instead of round-2's stale budget.

NOTE: module variables must be passed as jit ARGUMENTS, not closed
over — closed-over weights are serialized into the compile payload and
the remote compile server rejects >? 100 MB bodies (HTTP 413).

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


def slope(name, body, variables, stack, reps=3):
    """body(variables, one_input) -> scalar; stack is [R_HI, ...] (or a
    tuple of such). Weights go through as jit args, never constants."""
    cut = lambda s, r: jax.tree_util.tree_map(lambda t: t[:r], s)

    def run(v, s):
        def step(acc, inp):
            return acc + body(v, inp), None
        out, _ = jax.lax.scan(step, jnp.float32(0), s)
        return out

    f1 = jax.jit(lambda v, s: run(v, cut(s, 1)))
    fh = jax.jit(lambda v, s: run(v, cut(s, R_HI)))
    float(f1(variables, stack)); float(fh(variables, stack))
    t1s, ths = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1(variables, stack))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fh(variables, stack))
        ths.append(time.perf_counter() - t0)
    per = (min(ths) - min(t1s)) / (R_HI - 1)
    print(f"{name:52s} {per * 1000:8.1f} ms", flush=True)
    return per


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
    t_full = slope("FULL forward (serving)",
                   lambda v, x: jnp.sum(model.apply(v, x)[2]), mv, xs)
    print(f"  -> {B / t_full:.1f} clouds/s/chip", flush=True)

    enc = SpareNetEncode(bottleneck_size=4096, hide_size=4096,
                         use_selayer=True, encode="Residualnet", train=False)
    ev = enc.init({"params": jax.random.PRNGKey(0)}, xs[0])
    slope("encoder (incl bottleneck)",
          lambda v, x: jnp.sum(enc.apply(v, x)), ev, xs)

    styles = jnp.asarray(rs.rand(R_HI, B, 4096), jnp.float32)
    dec = SpareNetDecode(num_points=16384, n_primitives=32,
                         bottleneck_size=4096, use_adain="share",
                         use_selayer=True, train=False)
    dv = dec.init({"params": jax.random.PRNGKey(0)}, styles[0])
    slope("decoder", lambda v, s: jnp.sum(dec.apply(v, s)), dv, styles)

    coarse = jax.jit(lambda v, x: model.apply(v, x)[0])(mv, xs[0])
    coarses = jnp.stack([coarse + 1e-4 * i for i in range(R_HI)])
    ref = SpareNetRefine(num_points=16384, n_primitives=32,
                         use_selayer=True, train=False)
    refv = ref.init(jax.random.PRNGKey(0), coarses[0], xs[0])
    slope("refine x1",
          lambda v, inp: jnp.sum(ref.apply(v, inp[0], inp[1])[0]),
          refv, (coarses, xs))

    # encoder internals at HEAD: packed kNN + pallas gather per stage
    for ci, co in [(3, 256), (256, 256), (256, 512), (512, 1024)]:
        fs = jnp.asarray(rs.rand(R_HI, B, N, ci) - 0.5, jnp.float32)
        slope(f"  knn C={ci} (packed)",
              lambda v, x: jnp.sum(knn_idx(x, k=8).astype(jnp.float32)),
              (), fs)
        gs = jnp.asarray(rs.rand(R_HI, B, N, co) - 0.5, jnp.float32)
        idx = jax.jit(jax.vmap(lambda x: knn_idx(x, k=8)))(fs)
        slope(f"  pallas gather+max+sum C={co}",
              lambda v, inp: sum(
                  jnp.sum(o.astype(jnp.float32)) for o in
                  gather_rows_max(inp[0], inp[1], need_sum=True)),
              (), (gs, idx))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
