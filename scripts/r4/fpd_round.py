"""Tracked per-round FPD of the trained flagship (VERDICT r3 task #7).

Scores the flagship's ACTUAL completions (not corrupted-cloud
stand-ins) against ground truth with the pinned canonical classifier
(sparenet_tpu/data/fpd_cls_canonical.npz, docs/FPD_ARTIFACT.md):
generate completions for a fixed synthetic val set, compute overall +
per-category FPD, and do the same for an EARLIER checkpoint of the same
run so the number demonstrably moves with model quality.

Protocol mirrors the reference FPD harness (test_fpd.py:91-136:
batch 30, dims 1808, fixed model list, per-category + overall).

Run ON TPU in background to natural completion:
  python scripts/r4/fpd_round.py --weights <ckpt-best> \
      [--early <ckpt-epoch-004>] [--n 150] [--out /tmp/fpd_round.json]
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


def complete(weights, partials, batch=8):
    """Run the flagship (parity eval mode) over partials [M, N_in, 3]."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from sparenet_tpu.models import SpareNetGenerator

    model = SpareNetGenerator(
        num_points=16384, n_primitives=32, bottleneck_size=4096,
        hide_size=4096, use_selayer=True, use_adain="share",
        encode="Residualnet", train=False)
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(weights))
    state = payload["state"]
    variables = jax.device_put(
        {"params": state["params"], "batch_stats": state["batch_stats"]})

    fwd = jax.jit(lambda v, x: model.apply(v, x)[2])
    outs = []
    for s in range(0, partials.shape[0], batch):
        chunk = jnp.asarray(partials[s:s + batch], jnp.float32)
        outs.append(np.asarray(fwd(variables, chunk)))
    return np.concatenate(outs, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--early", default="",
                    help="earlier checkpoint of the same run, to show "
                         "the FPD tracks model quality")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--classifier", default=_CANONICAL)
    ap.add_argument("--out", default="/tmp/fpd_round.json")
    args = ap.parse_args()

    from test_fpd import load_classifier  # root CLI helpers
    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset
    from sparenet_tpu.frechet.fpd import calculate_fpd

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
    result = {"n": args.n, "classifier": os.path.basename(args.classifier)}

    for tag, w in [("final", args.weights)] + (
            [("early", args.early)] if args.early else []):
        fakes = complete(w, partials)
        overall = calculate_fpd(fakes, gts, variables, batch_size=30)
        per_cat = {}
        for c in sorted(set(labels.tolist())):
            m = labels == c
            if m.sum() < 10:
                continue
            # 50/category at the default n=400 (the reference protocol
            # is 150/category, test_fpd.py:91-115; completions are
            # cheap here so per-category noise is bounded by sample
            # count, not generation cost)
            per_cat[f"synthetic_{c}"] = round(calculate_fpd(
                fakes[m], gts[m], variables,
                batch_size=min(25, int(m.sum()) // 2)), 3)
        result[tag] = {"weights": w, "overall": round(overall, 3),
                       "per_category": per_cat}
        print(json.dumps({tag: result[tag]["overall"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
