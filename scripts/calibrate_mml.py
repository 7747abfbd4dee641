"""Calibrate the serving-mode mean-MST-length estimator per model family.

The NN-mean -> mml ratio is coarse-cloud-distribution dependent
(advisor r2: SpareNet's 3.18 was fit on SpareNet coarse outputs and does
not automatically transfer to MSN), so each family carries its own
``mml_calibration`` knob. This script measures, on REAL coarse clouds of
the chosen family:

  1. ratio = exact mml (expansion_penalty, Prim's MST,
     cuda/expansion_penalty_cuda.cu:45-57 semantics) / NN-mean estimate
     (calibration=1) — mean and std over batch;
  2. the end-to-end serving-vs-parity CD drift of the family forward
     with the calibrated constant (the MDS temperature consumes
     t = 5*mml^2, cuda/MDS/MDS_cuda.cu:114-133, so mml error enters
     quadratically).

Run ON TPU (background, natural completion):
  python scripts/calibrate_mml.py --model msn
  python scripts/calibrate_mml.py --model sparenet [--weights ckpt]

--weights loads a checkpoint (orbax dir or .pth) so the calibration can
be re-validated on TRAINED coarse distributions (docs/SERVING_ENVELOPE.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sparenet", "msn"], default="msn")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-in", type=int, default=3000)
    ap.add_argument("--weights", default=None,
                    help="checkpoint (orbax dir or .pth) for trained-"
                         "weights calibration")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparenet_tpu.ops import common as opc
    from sparenet_tpu.ops.chamfer import chamfer_distance
    from sparenet_tpu.ops.expansion_penalty import (
        expansion_penalty, mean_mst_length_estimate)

    rs = np.random.RandomState(args.seed)
    partial = jnp.asarray(
        rs.rand(args.batch, args.n_in, 3) - 0.5, jnp.float32)

    if args.model == "msn":
        from sparenet_tpu.models.msn import MSN
        n_points, s = 16384, 16384 // 32
        model = MSN(num_points=n_points, bottleneck_size=1024,
                    n_primitives=32, train=False)
        grids = jnp.asarray(rs.rand(32, args.batch, s, 2), jnp.float32)
        init_kw = dict(grids=grids)
    else:
        from sparenet_tpu.models import SpareNetGenerator
        n_points, s = 16384, 16384 // 32
        model = SpareNetGenerator(
            num_points=n_points, n_primitives=32, bottleneck_size=4096,
            hide_size=4096, use_selayer=True, use_adain="share",
            encode="Residualnet", train=False)
        init_kw = {}

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           partial, **init_kw)
    if args.weights:
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.weights))
        state = payload["state"]
        # device_put: orbax restores HOST numpy arrays; as jit args
        # they would re-transfer through the tunnel every call
        variables = jax.device_put(
            {"params": state["params"],
             "batch_stats": state["batch_stats"]})

    # --- coarse clouds in PARITY mode (the distribution being served) ---
    opc.set_fast_math(False)

    @jax.jit
    def fwd_parity(v, x):
        return model.apply(v, x, **init_kw)

    outs = fwd_parity(variables, partial)
    coarse = np.asarray(outs[0])
    print(f"coarse cloud stats: std {coarse.std():.4f} "
          f"bbox {coarse.min():.3f}..{coarse.max():.3f}", flush=True)

    # --- 1. ratio on the real coarse distribution ---
    c = jnp.asarray(coarse)
    _, _, mml_exact = jax.jit(
        lambda x: expansion_penalty(x, s, 1.5))(c)
    nn_mean = jax.jit(
        lambda x: mean_mst_length_estimate(x, s, calibration=1.0))(c)
    ratio = np.asarray(mml_exact) / np.asarray(nn_mean)
    cal = float(ratio.mean())
    print(f"[{args.model}] mml/nn_mean ratio: mean {cal:.4f} "
          f"std {ratio.std():.4f}  (per-batch min {ratio.min():.4f} "
          f"max {ratio.max():.4f})", flush=True)

    # --- 2. end-to-end serving CD drift with this calibration ---
    parity_refine = np.asarray(outs[1] if args.model == "msn" else outs[2])

    opc.set_fast_math(True)
    model_cal = model.clone(mml_calibration=cal)

    @jax.jit
    def fwd_serving(v, x):
        return model_cal.apply(v, x, **init_kw)

    outs_s = fwd_serving(variables, partial)
    serving_refine = np.asarray(outs_s[1] if args.model == "msn"
                                else outs_s[2])
    cd = float(jax.jit(chamfer_distance)(
        jnp.asarray(serving_refine), jnp.asarray(parity_refine)))
    print(f"[{args.model}] serving-vs-parity CD (calibration {cal:.3f}): "
          f"{cd:.3e}", flush=True)

    # drift with the UNcalibrated default, for comparison
    @jax.jit
    def fwd_serving_default(v, x):
        return model.apply(v, x, **init_kw)

    outs_d = fwd_serving_default(variables, partial)
    default_refine = np.asarray(outs_d[1] if args.model == "msn"
                                else outs_d[2])
    cd_d = float(jax.jit(chamfer_distance)(
        jnp.asarray(default_refine), jnp.asarray(parity_refine)))
    dflt = model.mml_calibration
    print(f"[{args.model}] serving-vs-parity CD (default {dflt}): "
          f"{cd_d:.3e}", flush=True)
    opc.set_fast_math(False)


if __name__ == "__main__":
    main()
