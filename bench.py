#!/usr/bin/env python
"""Benchmark: SpareNet completion throughput on one TPU chip.

Flagship configuration (configs/sparenet.yaml parity): 3000 input points
-> 16384 output points, EdgeConv (Residualnet) encoder, shared-AdaIN
32-primitive folding, SE layers, double refine (expansion-penalty MST +
MDS resample + residual net).

Prints ONE JSON line:
  {"metric": "sparenet_inference", "value": clouds_per_sec,
   "unit": "clouds/sec/chip", "vs_baseline": value / 250}
(vs_baseline: the driver north star is ">= 2000 completed 16384-pt
clouds/sec on v5e-8" (/root/repo/BASELINE.json) — an 8-chip pod, i.e.
250 clouds/sec/chip; data parallelism over the pod is linear in chips.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    dtype_flag = os.environ.get("BENCH_DTYPE", "bf16")

    import jax
    import jax.numpy as jnp
    from sparenet_tpu.models import SpareNetGenerator

    if dtype_flag == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False,
    )
    rs = np.random.RandomState(0)
    partial = jnp.asarray(rs.rand(batch, 3000, 3) - 0.5, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial)

    @jax.jit
    def forward(variables, partial):
        coarse, middle, refine, _ = model.apply(variables, partial)
        # scalar checksum: forces full materialization through the device
        # tunnel without a bulk transfer
        return jnp.sum(refine)

    float(forward(variables, partial))
    for _ in range(warmup - 1):
        float(forward(variables, partial))

    # dispatch asynchronously, sync once: the device executes the steps
    # back-to-back either way, but per-step host syncs would add the
    # tunnel's ~40 ms transfer latency to every iteration
    t0 = time.perf_counter()
    outs = [forward(variables, partial) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    s = float(outs[-1])
    assert np.isfinite(s)

    clouds_per_sec = batch * iters / dt
    result = {
        "metric": "sparenet_inference",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / 250.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
