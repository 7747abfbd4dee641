#!/usr/bin/env python
"""Throughput across all four model families on one TPU chip.

Companion to the driver-facing bench.py (which benches the flagship
SpareNet only): builds each generator at its production config (the
per-model yaml in sparenet_tpu/configs), times an on-device lax.scan
over distinct inputs (one dispatch for the whole run, like bench.py),
and prints one JSON line per family.

Usage: python scripts/bench_models.py [--models sparenet,atlasnet,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_one(model_name: str, batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import sparenet_tpu.configs as configs
    from sparenet_tpu.configs import cfg_from_file
    from sparenet_tpu.models import define_G

    yaml_path = os.path.join(os.path.dirname(configs.__file__),
                             f"{model_name}.yaml")
    cfg = cfg_from_file(yaml_path)
    model = define_G(cfg, train=False)
    n_in = cfg.CONST.n_input_points
    rs = np.random.RandomState(0)
    partials = jnp.asarray(rs.rand(iters, batch, n_in, 3) - 0.5, jnp.float32)

    rngs = {"params": jax.random.PRNGKey(0)}
    apply_rngs = {}
    if model_name == "atlasnet" or model_name == "msn":
        rngs["grid"] = jax.random.PRNGKey(1)
        apply_rngs["grid"] = jax.random.PRNGKey(2)
    if model_name == "grnet":
        rngs["sample"] = jax.random.PRNGKey(1)
        apply_rngs["sample"] = jax.random.PRNGKey(2)
    variables = model.init(rngs, partials[0])

    # explicit per-family index of the final output cloud in the model's
    # return tuple — fails loudly (KeyError) if a family's arity changes:
    #   sparenet (coarse, middle, refine, loss_mst) -> refine
    #   msn      (coarse, refine, loss_mst)         -> refine
    #   grnet    (sparse, dense)                    -> dense
    #   atlasnet single cloud                       -> itself
    out_index = {"sparenet": 2, "msn": 1, "grnet": 1, "atlasnet": None}[
        model_name]

    @jax.jit
    def forward_many(variables, partials):
        def step(acc, partial):
            out = model.apply(variables, partial, rngs=apply_rngs)
            cloud = out if out_index is None else out[out_index]
            return acc + jnp.sum(cloud), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), partials)
        return acc

    float(forward_many(variables, partials))  # compile + warm
    t0 = time.perf_counter()
    s = float(forward_many(variables, partials))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return {
        "metric": f"{model_name}_inference",
        "value": round(batch * iters / dt, 2),
        "unit": "clouds/sec/chip",
        "batch": batch,
        "n_in": n_in,
        "n_out": cfg.DATASET.n_outpoints,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="atlasnet,msn,grnet,sparenet")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    # same mode convention as bench.py: BENCH_DTYPE=bf16 (default) is
    # FULL serving mode (fast-math + bf16 matmuls); fp32 is parity mode
    dtype_flag = os.environ.get("BENCH_DTYPE", "bf16")
    if dtype_flag == "bf16":
        os.environ.setdefault("SPARENET_FAST_MATH", "1")
    import jax
    if dtype_flag == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    # derive mode from the EXECUTED fast-math state (a stray
    # SPARENET_FAST_MATH=0 in the env would otherwise mislabel rows)
    from sparenet_tpu.ops import common as opc
    bf16 = dtype_flag == "bf16"
    mode = ("serving" if (opc.FAST_MATH and bf16) else
            "parity" if (not opc.FAST_MATH and not bf16) else "mixed")
    for m in args.models.split(","):
        rec = bench_one(m.strip(), args.batch, args.iters)
        rec["mode"] = mode
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
