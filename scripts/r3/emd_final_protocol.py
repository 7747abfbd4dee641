"""Execute the published EMD FINAL-TEST protocol once on hardware
(VERDICT r2 missing #3 / task #5).

Reference: utils/misc.py:206-211 — validation EMD runs eps=0.005,
iters=50; the paper's final test runs eps=0.002, iters=10000. Our
auction exits early once every bidder is assigned (ops/emd.py:244-260,
provably identical to running all rounds), which is what makes
iters=10000 feasible. This script drives ONE val batch of trained-
flagship outputs vs ground truth through BOTH settings and records
wall time, the executed round count, and the metric delta.

Run ON TPU (background, natural completion):
  python scripts/r3/emd_final_protocol.py [--weights ckpt] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

_DEFAULT_CKPT = ("/tmp/r3_synth_run/checkpoints/"
                 "2026-08-19T12-50-33.998582/ckpt-best")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=_DEFAULT_CKPT)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--allow-random-init", action="store_true",
                    help="proceed without a checkpoint (protocol cost "
                         "then reflects degenerate clouds — debug only)")
    args = ap.parse_args()
    if not (args.weights and os.path.isdir(args.weights)) \
            and not args.allow_random_init:
        sys.exit(f"checkpoint not found: {args.weights}\n"
                 "Train one with scripts/r3/train_synth_sparenet.yaml "
                 "and pass --weights, or pass --allow-random-init.")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.ops.emd import _emd_batched

    # --- one val batch of TRAINED flagship completions -------------------
    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    cfg = default_config()
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 3000
    ds = SyntheticDataset(cfg, VAL)
    items = [ds[i] for i in range(args.batch)]
    partial = jnp.asarray(
        np.stack([np.asarray(it[3]["partial_cloud"]) for it in items]),
        jnp.float32)
    gt = jnp.asarray(
        np.stack([np.asarray(it[3]["gtcloud"]) for it in items]),
        jnp.float32)

    variables = model.init({"params": jax.random.PRNGKey(0)}, partial[:1])
    if args.weights and os.path.isdir(args.weights):
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.weights))
        state = payload["state"]
        # device_put: orbax restores HOST numpy arrays; as jit args
        # they would re-transfer through the tunnel every call
        variables = jax.device_put(
            {"params": state["params"],
             "batch_stats": state["batch_stats"]})
        print(f"loaded trained weights: {args.weights}", flush=True)
    else:
        print("WARNING: no checkpoint — random init", flush=True)

    pred = jax.jit(lambda v, x: model.apply(v, x)[2])(variables, partial)
    jax.block_until_ready(pred)
    print(f"pred cloud std {float(jnp.std(pred)):.4f}", flush=True)

    # --- both protocols: (value, rounds, wall) ---------------------------
    # reference protocol rescales clouds to [0, 1] for EMD
    lo = jnp.minimum(pred.min(axis=(1, 2), keepdims=True),
                     gt.min(axis=(1, 2), keepdims=True))
    hi = jnp.maximum(pred.max(axis=(1, 2), keepdims=True),
                     gt.max(axis=(1, 2), keepdims=True))
    p01 = (pred - lo) / jnp.maximum(hi - lo, 1e-6)
    g01 = (gt - lo) / jnp.maximum(hi - lo, 1e-6)

    for name, eps, iters in (("validation", 0.005, 50),
                             ("final-test", 0.002, 10000)):
        f = jax.jit(lambda a, b, e=eps, i=iters:
                    _emd_batched(a, b, e, i, return_rounds=True))
        dist, asg, rounds = f(p01, g01)          # compile
        jax.block_until_ready(dist)
        t0 = time.perf_counter()
        dist, asg, rounds = f(p01, g01)
        emd = float(jnp.mean(jnp.sqrt(dist)) * 100.0)
        wall = time.perf_counter() - t0
        # convergence diagnostic: the forced last round (emd_cuda.cu:
        # 197-216 semantics) maps every still-unassigned bidder onto its
        # current target, so non-convergence shows up as target
        # COLLISIONS (a perfect matching has none)
        a_np = np.asarray(asg)
        coll = np.array([16384 - np.unique(row).size for row in a_np])
        print(f"[{name}] eps={eps} iters={iters}: EMD {emd:.4f}  "
              f"rounds {int(rounds)}  wall {wall*1e3:.0f} ms  "
              f"collisions/16384: mean {coll.mean():.0f} "
              f"max {coll.max()} (B={args.batch})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
