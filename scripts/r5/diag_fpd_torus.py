"""Explain the FPD synthetic_3 (torus) anomaly (VERDICT r4 task #5).

The tracked FPD (docs/artifacts/r4/r4_stage4/fpd_round.json) shows
synthetic_3 at 2139.8 — 40-80x every other category — and WORSENING
during training (2055.7 at epoch 8) while all others improve 3-10x.
Two candidate explanations:

  1. real mode failure: the torus is the only category with a
     topological hole; if completions fill the hole (or blob), FPD
     catches a perceptual failure that CD/F-Score under-report;
  2. classifier/estimator artifact: the canonical classifier's
     activations on tori may be degenerate (a blind spot of the
     natively-trained classifier), making the per-category Gaussian
     fit meaningless regardless of completion quality.

Separating measurements, per category:

  A. GT-vs-GT FPD noise floor: split each category's 50 gt clouds into
     two halves and score them against each other. A clean category
     floors near the sample-size bias (~20-60 at n=25); a torus floor
     in the hundreds/thousands proves estimator/classifier artifact.
  B. completion-vs-GT CD/F-Score per category: if torus CD/F are in
     family with the other categories, the completions are NOT
     degenerate at the geometric level.
  C. FPD(completions, gt) per category (reproducing the r4 number on
     the same protocol) so A and C are directly comparable.
  D. 3-view renders of the first 3 torus completions + gts
     (out/torus_*.png) for eyeballing the hole.

Run ON TPU in background:
  python scripts/r5/diag_fpd_torus.py --weights <ckpt-best> \
      [--n 400] [--outdir /tmp/r5_fpd_diag]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

_CANONICAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "sparenet_tpu", "data", "fpd_cls_canonical.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--classifier", default=_CANONICAL)
    ap.add_argument("--outdir", default="/tmp/r5_fpd_diag")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from test_fpd import load_classifier
    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset
    from sparenet_tpu.frechet.fpd import calculate_fpd
    from sparenet_tpu.utils.metrics import chamfer_metric, f_score
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "r4"))
    from fpd_round import complete  # reuse the r4 completion driver

    cfg = default_config()
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 3000
    cfg.DATASETS.synthetic.n_val = args.n
    ds = SyntheticDataset(cfg, VAL)
    items = [ds[i] for i in range(args.n)]
    partials = np.stack([np.asarray(it[3]["partial_cloud"]) for it in items])
    gts = np.stack([np.asarray(it[3]["gtcloud"]) for it in items])
    labels = np.asarray([it[1] for it in items])

    variables = load_classifier(args.classifier)
    fakes = complete(args.weights, partials)

    @jax.jit
    def geo(a, b):
        return chamfer_metric(a, b), f_score(a, b)

    report = {"weights": args.weights, "n": args.n, "per_category": {}}
    print(f"{'cat':12s} {'floor(gt|gt)':>12s} {'FPD(fake|gt)':>12s} "
          f"{'CD*1000':>8s} {'F@0.01':>7s}", flush=True)
    for c in sorted(set(labels.tolist())):
        m = labels == c
        g, f = gts[m], fakes[m]
        half = m.sum() // 2
        bs = max(10, half // 2)
        floor = calculate_fpd(g[:half], g[half:2 * half], variables,
                              batch_size=bs)
        fpd = calculate_fpd(f, g, variables, batch_size=min(25, half))
        cds, fss = [], []
        for s in range(0, int(m.sum()), 10):
            cd_b, fs_b = geo(jnp.asarray(f[s:s + 10]),
                             jnp.asarray(g[s:s + 10]))
            cds.append(np.asarray(cd_b)), fss.append(np.asarray(fs_b))
        cd = float(np.concatenate(cds).mean())
        fs = float(np.concatenate(fss).mean())
        name = f"synthetic_{c}"
        report["per_category"][name] = {
            "gt_floor": round(float(floor), 2),
            "fpd": round(float(fpd), 2),
            "cd1000": round(cd, 4), "f_score": round(fs, 4)}
        print(f"{name:12s} {floor:12.1f} {fpd:12.1f} {cd:8.4f} {fs:7.4f}",
              flush=True)

    # D. eyeball renders of torus (category 3) completions
    from sparenet_tpu.utils.visualizer import plot_pcd_three_views
    tor = np.nonzero(labels == 3)[0][:3]
    for i, idx in enumerate(tor):
        plot_pcd_three_views(
            os.path.join(args.outdir, f"torus_{i}.png"),
            [partials[idx], fakes[idx], gts[idx]],
            ["partial", "completion", "gt"])
    print(f"renders -> {args.outdir}/torus_*.png", flush=True)

    with open(os.path.join(args.outdir, "fpd_torus_diag.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
