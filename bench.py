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


def _mode(dtype_flag: str) -> str:
    """serving | parity | mixed, from the EXECUTED fast-math state."""
    from sparenet_tpu.ops import common as opc
    bf16 = dtype_flag == "bf16"
    if opc.FAST_MATH and bf16:
        return "serving"
    if not opc.FAST_MATH and not bf16:
        return "parity"
    return "mixed"


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    dtype_flag = os.environ.get("BENCH_DTYPE", "bf16")

    # BENCH_DTYPE=bf16 (default) is FULL serving mode: bfloat16 matmuls
    # AND bf16 activations on the HBM-bound chains (edge tensors, MDS
    # coords, decoder/refiner convs — SPARENET_FAST_MATH). The CD/EMD
    # parity contract (BASELINE.md: within 1e-4 of the CUDA reference,
    # fp32) is about the metric kernels, which pin fp32 + HIGHEST
    # internally in either mode. BENCH_DTYPE=fp32 benches parity mode.
    if dtype_flag == "bf16":
        os.environ.setdefault("SPARENET_FAST_MATH", "1")

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
    # a distinct input per iteration (stacked): the on-device scan below
    # cannot be collapsed by CSE, and every step does real work
    partials = jnp.asarray(
        rs.rand(iters, batch, 3000, 3) - 0.5, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, partials[0])

    @jax.jit
    def forward(variables, partial):
        coarse, middle, refine, _ = model.apply(variables, partial)
        # scalar checksum: forces full materialization through the device
        # tunnel without a bulk transfer
        return jnp.sum(refine)

    @jax.jit
    def forward_many(variables, partials):
        # iteration loop ON DEVICE: one dispatch for the whole timed run.
        # Per-dispatch tunnel/runtime overhead (~30 ms through the axon
        # proxy) would otherwise be billed to every iteration — a real
        # deployment loops on device and never pays it per step.
        def step(acc, partial):
            _, _, refine, _ = model.apply(variables, partial)
            return acc + jnp.sum(refine), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), partials)
        return acc

    for _ in range(warmup):
        float(forward(variables, partials[0]))
    float(forward_many(variables, partials))  # compile + final warmup

    t0 = time.perf_counter()
    s = float(forward_many(variables, partials))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)

    clouds_per_sec = batch * iters / dt
    result = {
        "metric": "sparenet_inference",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / 250.0, 4),
        # bf16 matmuls + FAST_MATH = full serving mode (fast math,
        # batched MDS, NN-mean mml); fp32 + no fast math = parity mode
        # (reference-faithful numerics). Derived from the EXECUTED
        # state (opc.FAST_MATH), not just BENCH_DTYPE — a stray
        # SPARENET_FAST_MATH in the environment would otherwise
        # mislabel the record.
        "mode": _mode(dtype_flag),
    }
    if result["mode"] == "serving":
        # record which MDS implementation the serving refine actually
        # resolved to (batched | hybrid | explicit override), plus the
        # batch-greedy dial state (round plan + selection arm) so each
        # record is self-describing
        from sparenet_tpu.ops import mds as _mds
        result["mds"] = _mds.resolve_impl()
        if result["mds"] in ("batched", "hybrid"):
            dial = _mds.dial_state()
            result["mds_rounds"] = dial["rounds"]
            result["mds_select"] = dial["select"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
