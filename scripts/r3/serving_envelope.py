"""The trained-weights serving-quality contract (VERDICT r2 weak #2 /
task #2) — the artifact behind docs/SERVING_ENVELOPE.md.

Round 2's serving drift numbers were all measured at random init;
tests/test_serving_mode.py promised a trained-weights on-hardware
contract that did not exist. This script delivers it: load the trained
flagship checkpoint, drive a REAL synthetic val batch through the
parity forward (fp32, exact kernels) and the serving forward
(SPARENET_FAST_MATH: bf16 chains, packed-key kNN, batch-greedy MDS,
NN-mean mml), and report

  1. the raw cloud drift CD(serving_refine, parity_refine), and
  2. the METRIC-level contract: reference-unit ChamferDistance
     ((mean d1 + mean d2) * 1000, utils/misc.py:201-203), F-Score@0.01
     and val-protocol EMD of refine-vs-GT in BOTH modes — i.e. how much
     the reported quality numbers move if you evaluate a served model.

Run ON TPU (background, natural completion):
  python scripts/r3/serving_envelope.py [--weights ckpt] [--batch 16] \
      [--calibration 1.33]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

_DEFAULT_CKPT = ("/tmp/r3_synth_run/checkpoints/"
                 "2026-08-19T12-50-33.998582/ckpt-best")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=_DEFAULT_CKPT)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--calibration", type=float, default=1.33)
    ap.add_argument("--allow-random-init", action="store_true",
                    help="proceed without a checkpoint (the envelope "
                         "numbers are then meaningless — debug only)")
    args = ap.parse_args()
    if not os.path.isdir(args.weights) and not args.allow_random_init:
        sys.exit(f"checkpoint not found: {args.weights}\n"
                 "This artifact is a TRAINED-weights contract — train "
                 "one with scripts/r3/train_synth_sparenet.yaml "
                 "(python train.py --model sparenet --config ... "
                 "--workdir ...) and pass --weights, or pass "
                 "--allow-random-init to debug.")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.ops import common as opc
    from sparenet_tpu.ops.chamfer import chamfer_distance
    from sparenet_tpu.utils.metrics import chamfer_metric, emd_metric, f_score

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

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False,
        mml_calibration=args.calibration)
    variables = model.init({"params": jax.random.PRNGKey(0)}, partial[:1])
    if os.path.isdir(args.weights):
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
        print("WARNING: random init (no checkpoint found)", flush=True)

    def run(mode_fast: bool):
        opc.set_fast_math(mode_fast)
        out = jax.jit(lambda v, x: model.apply(v, x))(variables, partial)
        refine = np.asarray(out[2])
        opc.set_fast_math(False)
        return refine

    refine_p = run(False)
    refine_s = run(True)

    drift = float(jax.jit(chamfer_distance)(
        jnp.asarray(refine_s), jnp.asarray(refine_p)))
    print(f"raw drift CD(serving, parity) = {drift:.3e} "
          f"(calibration {args.calibration})", flush=True)

    # --- attribution ablations: serving with one knob reverted --------
    import sparenet_tpu.ops.knn as knn_mod
    import sparenet_tpu.ops.mds as mds_mod

    # save the env-configured baselines so each ablation reverts ONE
    # knob relative to the user's configuration, not to hardcoded values
    impl0, packed0, g0 = mds_mod._MDS_IMPL, knn_mod._PACKED, \
        mds_mod._MDS_BATCH_G

    ablations = []
    mds_mod._MDS_IMPL = "pallas"              # exact greedy MDS kernel
    ablations.append(("serving - exactMDS ", run(True)))
    mds_mod._MDS_IMPL = "hybrid"              # r4 batched-prefix/exact-tail
    ablations.append(("serving - hybridMDS", run(True)))
    tail0 = mds_mod._MDS_TAIL
    mds_mod._MDS_TAIL = 1024                  # short-tail speed point
    ablations.append(("serving - hyb t1024", run(True)))
    mds_mod._MDS_TAIL = tail0
    mds_mod._MDS_IMPL = impl0
    knn_mod._PACKED = False                   # exact kNN selection
    ablations.append(("serving - exactKNN ", run(True)))
    knn_mod._PACKED = packed0
    # batch-greedy round-size sweep: the G=8192 default was tuned on
    # random-init clouds; the metric movement on TRAINED clouds is
    # MDS-dominated, so re-tune the quality/speed point here
    for g in (4096, 2048, 1024):
        mds_mod._MDS_BATCH_G = g
        ablations.append((f"serving @ MDS G={g:5d}", run(True)))
    mds_mod._MDS_BATCH_G = g0

    rows = [("parity  ", refine_p), ("serving ", refine_s)] + ablations
    for name, refine in rows:
        r = jnp.asarray(refine)
        cd = np.asarray(chamfer_metric(r, gt))
        fs = np.asarray(f_score(r, gt))
        em = np.asarray(emd_metric(r, gt))            # eps=.005, iters=50
        print(f"[{name}] vs GT: CD*1000 {cd.mean():.4f}  "
              f"F-Score@0.01 {fs.mean():.4f}  EMD {em.mean():.4f}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
