"""GAN epochs vs plain epochs — what adversarial rendering buys
(VERDICT r4 task #6; reference thesis:
runners/sparenet_gan_runner.py:192-346, the CVPR paper's core claim).

From the SAME converged generator checkpoint, train the SAME number of
steps twice:

  arm "gan":   SpareNet-GAN runner (renderer + discriminator, adv +
               feature-match + image-match on 8-view depth maps,
               errG = 200*rec + 0.1*adv + 1*fm + 1*im);
  arm "plain": plain SpareNet runner (rec loss only);

then score BOTH end states (and the untouched parent) on the same val
protocol: FPD (canonical classifier, per-category + overall) and
CD*1000 / F-Score@0.01. Rec loss uses chamfer in both arms (the parent
was chamfer-trained; EMD would triple the step cost without touching
the adversarial-term question).

Run ON TPU in background:
  python scripts/r5/gan_ab.py --weights <converged ckpt-best> \
      [--epochs 3] [--batch 8] [--out /tmp/r5_gan_ab]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "r4"))

import numpy as np

# SMOKE=1: tiny-shape CPU plumbing check (random init allowed) —
# validates both arms + the eval path without the device
_SMOKE = bool(int(os.environ.get("SMOKE", "0")))

_CANONICAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "sparenet_tpu", "data", "fpd_cls_canonical.npz")


def build(gan: bool, batch: int, n_train: int, out_path: str):
    from sparenet_tpu.configs import default_config, cfg_update
    from sparenet_tpu.runners import get_runner
    from sparenet_tpu.utils.logging import set_logger

    cfg = default_config()
    cfg.DATASET.train_dataset = "Synthetic"
    cfg.DATASET.test_dataset = "Synthetic"
    cfg.DATASET.n_outpoints = 1024 if _SMOKE else 16384
    cfg.CONST.n_input_points = 64 if _SMOKE else 3000
    cfg.CONST.num_workers = 2
    cfg.NETWORK.model_type = "SpareNet"
    cfg.NETWORK.n_primitives = 4 if _SMOKE else 32
    cfg.NETWORK.metric = "chamfer"
    cfg.NETWORK.use_consist_loss = True
    cfg.NETWORK.use_selayer = True
    cfg.NETWORK.encode = "Residualnet"
    cfg.NETWORK.use_adain = "share"
    cfg.RENDER.img_size = 64 if _SMOKE else 256
    cfg.RENDER.radius_list = [10.0] if _SMOKE else [5.0, 7.0, 10.0]
    cfg.GAN.use_cgan = True
    cfg.GAN.use_fm = True
    cfg.GAN.use_im = True
    cfg.TRAIN.batch_size = batch
    cfg.TEST.batch_size = batch
    cfg.DATASETS.synthetic.n_train = n_train
    cfg.DATASETS.synthetic.n_val = 8
    cfg.DIR.out_path = out_path
    cfg_update(cfg, timestamp=False)
    logger = set_logger(None)
    runner = get_runner(cfg, gan=gan)(cfg, logger)
    runner.epoch_idx = 1
    runner.lr = float(cfg.TRAIN.learning_rate)
    runner.reset_meters()
    return runner


def warm_start(runner, weights):
    import jax
    import orbax.checkpoint as ocp
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(weights))
    state = payload["state"]
    runner.state = runner.state.replace(
        params=jax.device_put(state["params"]),
        batch_stats=jax.device_put(state["batch_stats"]))


def train_arm(runner, steps, tag):
    step = 0
    while step < steps:
        for items in runner.train_loader:
            if step >= steps:
                break
            runner.train_step(items)
            if step % 25 == 0:
                row = {k: round(v, 4) for k, v in runner.loss.items()}
                print(f"[{tag} {step:4d}] {row}", flush=True)
            if not all(np.isfinite(list(runner.loss.values()))):
                raise RuntimeError(f"{tag}: non-finite loss at {step}")
            step += 1
    return {"params": runner.state.params,
            "batch_stats": runner.state.batch_stats}


def evaluate(tag, variables, partials, gts, labels, cls_vars):
    import jax
    import jax.numpy as jnp
    from sparenet_tpu.frechet.fpd import calculate_fpd
    from sparenet_tpu.models import SpareNetGenerator
    from sparenet_tpu.utils.metrics import chamfer_metric, f_score

    model = SpareNetGenerator(
        num_points=1024 if _SMOKE else 16384,
        n_primitives=4 if _SMOKE else 32,
        bottleneck_size=4096, hide_size=4096, use_selayer=True,
        use_adain="share", encode="Residualnet", train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x)[2])

    @jax.jit
    def geo(a, b):
        return chamfer_metric(a, b), f_score(a, b)

    fakes, cds, fss = [], [], []
    for s in range(0, partials.shape[0], 8):
        chunk = jnp.asarray(partials[s:s + 8], jnp.float32)
        g = jnp.asarray(gts[s:s + 8], jnp.float32)
        r = fwd(variables, chunk)
        cd, fs = geo(r, g)
        fakes.append(np.asarray(r))
        cds.append(np.asarray(cd)), fss.append(np.asarray(fs))
    fakes = np.concatenate(fakes)
    cd, fs = float(np.concatenate(cds).mean()), float(
        np.concatenate(fss).mean())
    overall = calculate_fpd(fakes, gts, cls_vars, batch_size=30)
    per_cat = {}
    # per-category FPD costs one 1808^3 CPU sqrtm each; score only the
    # anomaly category (torus, see diag_fpd_torus.py) and one control
    for c in sorted(set(labels.tolist())):
        if c not in (0, 3):
            continue
        m = labels == c
        if m.sum() < 10:       # cov of <10 samples is meaningless
            continue
        per_cat[f"synthetic_{c}"] = round(calculate_fpd(
            fakes[m], gts[m], cls_vars,
            batch_size=min(25, int(m.sum()) // 2)), 2)
    out = {"fpd": round(float(overall), 2), "cd1000": round(cd, 4),
           "f_score": round(fs, 4), "per_category": per_cat}
    print(f"== {tag}: FPD {out['fpd']}  CD*1000 {cd:.4f}  F {fs:.4f}",
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=1536)
    ap.add_argument("--n-eval", type=int, default=400)
    ap.add_argument("--out", default="/tmp/r5_gan_ab")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    steps = args.epochs * (args.n_train // args.batch)

    import jax

    from test_fpd import load_classifier
    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import VAL, SyntheticDataset

    cfg = default_config()
    cfg.DATASET.n_outpoints = 1024 if _SMOKE else 16384
    cfg.CONST.n_input_points = 64 if _SMOKE else 3000
    cfg.DATASETS.synthetic.n_val = args.n_eval
    ds = SyntheticDataset(cfg, VAL)
    items = [ds[i] for i in range(args.n_eval)]
    partials = np.stack([np.asarray(it[3]["partial_cloud"]) for it in items])
    gts = np.stack([np.asarray(it[3]["gtcloud"]) for it in items])
    labels = np.asarray([it[1] for it in items])
    cls_vars = load_classifier(_CANONICAL)

    report = {"weights": args.weights, "epochs": args.epochs,
              "batch": args.batch, "steps": steps, "rec_loss": "chamfer"}

    # parent baseline first (cheap, catches eval-path problems early)
    if args.weights == "none" and _SMOKE:
        parent_vars = None
    else:
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.weights))
        parent_vars = jax.device_put(
            {"params": payload["state"]["params"],
             "batch_stats": payload["state"]["batch_stats"]})
        report["parent"] = evaluate("parent", parent_vars, partials, gts,
                                    labels, cls_vars)

    for tag, gan in (("gan", True), ("plain", False)):
        runner = build(gan, args.batch, args.n_train,
                       os.path.join(args.out, f"runner_{tag}"))
        if not (args.weights == "none" and _SMOKE):
            warm_start(runner, args.weights)
        state = train_arm(runner, steps, tag)
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        report[tag] = evaluate(tag, variables, partials, gts, labels,
                               cls_vars)
        del runner

    with open(os.path.join(args.out, "gan_ab.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k in ("parent", "gan", "plain")}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
