"""Round-5 stage 1: the serving quality contract with VARIANCE BARS
(VERDICT r4 weak #2 / task #1).

Every round-4 quality number rested on ONE B=16 val batch. This script
re-issues the fine-tuned envelope over NB independent val batches and
reports mean +- std of the per-batch metric means, plus the PAIRED
per-batch movement vs parity — turning the -3.1% / -0.1% readings into
contracts instead of anecdotes.

Also sweeps the intermediate MDS round sizes (G = 8192 / 6144 / 4096 /
3072 / 2048) that the round-4 dial table left blank, so the
quality-neutral + >= 1.0x configuration can be pinned (VERDICT r4
missing #1). Reference semantics being relaxed by the batched MDS:
/root/reference/cuda/MDS/MDS_cuda.cu:104-211.

Run ON TPU (background, natural completion):
  python scripts/r5/envelope_multibatch.py --weights <ckpt-best> \
      [--calibration 1.1497] [--batches 8] [--batch 16]

Note: the fine-tune recipe used n_val=16, so batch 0 reproduces the
round-4 single-batch numbers and batches 1..NB-1 are indices the
checkpoint selection never saw.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--calibration", type=float, default=1.1497)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()
    if not os.path.isdir(args.weights):
        sys.exit(f"checkpoint not found: {args.weights}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.ops import common as opc
    import sparenet_tpu.ops.mds as mds_mod
    from sparenet_tpu.utils.metrics import chamfer_metric, emd_metric, f_score

    nb, bs = args.batches, args.batch
    cfg = default_config()
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 3000
    cfg.DATASETS.synthetic.n_val = nb * bs
    ds = SyntheticDataset(cfg, VAL)
    items = [ds[i] for i in range(nb * bs)]
    partial = jnp.asarray(
        np.stack([np.asarray(it[3]["partial_cloud"]) for it in items]
                 ).reshape(nb, bs, -1, 3), jnp.float32)
    gt = jnp.asarray(
        np.stack([np.asarray(it[3]["gtcloud"]) for it in items]
                 ).reshape(nb, bs, -1, 3), jnp.float32)

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False,
        mml_calibration=args.calibration)
    import orbax.checkpoint as ocp
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.weights))
    state = payload["state"]
    variables = jax.device_put(
        {"params": state["params"], "batch_stats": state["batch_stats"]})
    print(f"loaded {args.weights}  calibration {args.calibration}  "
          f"{nb} batches x B={bs}", flush=True)

    @jax.jit
    def metrics(refine, gt_b):
        return (chamfer_metric(refine, gt_b), f_score(refine, gt_b),
                emd_metric(refine, gt_b))

    def run(mode_fast: bool):
        """Per-batch metric means for one config: [NB, 3]."""
        opc.set_fast_math(mode_fast)
        fwd = jax.jit(lambda v, x: model.apply(v, x)[2])
        rows = []
        for i in range(nb):
            r = fwd(variables, partial[i])
            cd, fs, em = metrics(r, gt[i])
            rows.append([float(np.asarray(cd).mean()),
                         float(np.asarray(fs).mean()),
                         float(np.asarray(em).mean())])
        opc.set_fast_math(False)
        return np.asarray(rows)                       # [NB, 3]

    g0, impl0 = mds_mod._MDS_BATCH_G, mds_mod._MDS_IMPL
    sched0, sel0 = mds_mod._MDS_SCHEDULE, mds_mod._MDS_SELECT
    configs = [("parity", None, None, None, None)]
    # FULL=0 keeps only the headline-decision configs (compile time per
    # config is the cost driver on chip)
    full = os.environ.get("FULL", "1") == "1"
    for g in ((8192, 6144, 4096, 3072, 2048) if full else (8192,)):
        configs.append((f"serving G={g}", g, None, None, None))
    # round-size schedules: early updates at ~G=8192's update work
    # (see ops/mds.py _MDS_SCHEDULE); SCHEDULES=0 skips
    if os.environ.get("SCHEDULES", "1") == "1":
        for sched in (((2048, 4096), (4096,), (2048,),
                       (1024, 2048, 4096)) if full
                      else ((4096,), (2048,))):
            configs.append((f"serving S={','.join(map(str, sched))}",
                            8192, None, sched, None))
    # PACK16=1: the relaxed-rank selection arm at the candidate headline
    # configs (ops/mds._select_smallest_pack16)
    if os.environ.get("PACK16", "0") == "1":
        for sched in ((4096,), (2048,)):
            configs.append(
                (f"serving S={sched[0]}/pack16", 8192, None, sched,
                 "pack16"))
        configs.append(("serving G=8192/pack16", 8192, None, None,
                        "pack16"))
    configs.append(("serving exactMDS", None, "pallas", None, None))

    results = {}
    for name, g, impl, sched, sel in configs:
        mds_mod._MDS_BATCH_G = g if g else g0
        mds_mod._MDS_IMPL = impl if impl else impl0
        mds_mod._MDS_SCHEDULE = sched if sched else sched0
        mds_mod._MDS_SELECT = sel if sel else sel0
        rows = run(name != "parity")
        results[name] = rows
        mds_mod._MDS_SCHEDULE = sched0
        mds_mod._MDS_SELECT = sel0
        m, s = rows.mean(0), rows.std(0)
        print(f"[{name:18s}] CD*1000 {m[0]:.4f}+-{s[0]:.4f}  "
              f"F {m[1]:.4f}+-{s[1]:.4f}  EMD {m[2]:.4f}+-{s[2]:.4f}",
              flush=True)
    mds_mod._MDS_BATCH_G, mds_mod._MDS_IMPL = g0, impl0

    # paired movement vs parity (per-batch deltas -> mean +- std)
    par = results["parity"]
    report = {"weights": args.weights, "calibration": args.calibration,
              "batches": nb, "batch_size": bs, "rows": {}}
    print("\n-- paired F-Score movement vs parity (the contract) --",
          flush=True)
    for name, rows in results.items():
        rel = (rows[:, 1] - par[:, 1]) / par[:, 1] * 100.0
        report["rows"][name] = {
            "cd_mean": round(float(rows[:, 0].mean()), 4),
            "cd_std": round(float(rows[:, 0].std()), 4),
            "f_mean": round(float(rows[:, 1].mean()), 4),
            "f_std": round(float(rows[:, 1].std()), 4),
            "emd_mean": round(float(rows[:, 2].mean()), 4),
            "emd_std": round(float(rows[:, 2].std()), 4),
            "f_move_pct_mean": round(float(rel.mean()), 2),
            "f_move_pct_std": round(float(rel.std()), 2),
            "per_batch_f": [round(float(v), 4) for v in rows[:, 1]],
        }
        if name != "parity":
            print(f"[{name:18s}] dF {rel.mean():+.2f}% +- {rel.std():.2f}%"
                  f"  (per-batch: {' '.join(f'{v:+.1f}' for v in rel)})",
                  flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json_out}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
