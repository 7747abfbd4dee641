"""Training-convergence A/B: dense EdgeConv vs pallas train-commute.

The round-4 COMMUTE_HW gate compared FREE-RUNNING dense vs commute
encoders and failed on encoder-output deviation (6.1e-2) with clean
loss/BN stats. scripts/r5/diag_commute.py separates the layers; if its
verdict is GRAPH-FLIP CASCADE (kernels exact, deviation = discrete kNN
near-tie flips cascading through stages 2-4), free-running bitwise
parity is the WRONG acceptance criterion — the reference's own
external knn_cuda wheel diverges from any exact kNN the same way. The
right criterion is semantic: training must converge equivalently.

Protocol (flagship config, Synthetic data, identical init + identical
data order across arms):

  arm dense    — TRAIN_COMMUTE off            (seed-0 init)
  arm commute  — TRAIN_COMMUTE=pallas         (seed-0 init)
  arm dense-s1 — TRAIN_COMMUTE off            (seed-1 init)  [yardstick]

|dense - commute| on the loss trajectory and end-state val CD is
compared against |dense - dense-s1| (the seed-to-seed envelope): the
commute arm PASSES if its divergence from dense stays well inside the
envelope of two runs that differ only by init seed.

Run ON TPU in background:
  python scripts/r5/commute_converge_ab.py [--steps 150] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/r5_stage6/commute_converge.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.data.datasets import TRAIN, VAL, SyntheticDataset
    from sparenet_tpu.models import define_G
    from sparenet_tpu.ops import common as opc
    from sparenet_tpu.runners.base import apply_updates, make_optimizer
    from sparenet_tpu.runners.sparenet import completion_loss
    from sparenet_tpu.utils.metrics import chamfer_metric

    cfg = default_config()
    cfg.NETWORK.model_type = "SpareNet"
    cfg.NETWORK.use_selayer = True
    cfg.NETWORK.n_primitives = 32
    cfg.NETWORK.metric = "chamfer"
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 3000
    cfg.TRAIN.batch_size = args.batch
    cfg.DATASETS.synthetic.n_train = args.steps * args.batch
    cfg.DATASETS.synthetic.n_val = 16

    ds = SyntheticDataset(cfg, TRAIN)
    vs = SyntheticDataset(cfg, VAL)
    val_p = jnp.asarray(np.stack(
        [np.asarray(vs[i][3]["partial_cloud"]) for i in range(16)]))
    val_g = jnp.asarray(np.stack(
        [np.asarray(vs[i][3]["gtcloud"]) for i in range(16)]))

    def batches():
        for s in range(args.steps):
            items = [ds[s * args.batch + i] for i in range(args.batch)]
            yield (jnp.asarray(np.stack(
                       [np.asarray(it[3]["partial_cloud"]) for it in items])),
                   jnp.asarray(np.stack(
                       [np.asarray(it[3]["gtcloud"]) for it in items])))

    data = list(batches())   # identical order for every arm

    def run_arm(tag, impl, seed):
        opc.TRAIN_COMMUTE = impl != "0"
        opc.TRAIN_COMMUTE_IMPL = impl
        model = define_G(cfg, train=True)
        variables = model.init({"params": jax.random.PRNGKey(seed)},
                               data[0][0])
        tx = make_optimizer(cfg)

        def step(params, batch_stats, opt_state, partial, gt):
            def loss_fn(p):
                (coarse, middle, refine, lm), upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, partial,
                    mutable=["batch_stats"])
                loss, _, _ = completion_loss(
                    cfg, coarse, middle, refine, lm, gt)
                return loss, upd["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt_state = apply_updates(
                tx, grads, opt_state, params, jnp.float32(1e-4))
            return loss, params, bs, opt_state

        jstep = jax.jit(step)
        p = variables["params"]
        bs = variables.get("batch_stats", {})
        o = tx.init(p)
        traj = []
        for i, (pa, gt) in enumerate(data):
            loss, p, bs, o = jstep(p, bs, o, pa, gt)
            if i % 10 == 0 or i == args.steps - 1:
                traj.append(round(float(loss), 6))
                print(f"[{tag} {i:4d}] loss {traj[-1]}", flush=True)
            if not np.isfinite(float(loss)):
                raise RuntimeError(f"{tag}: non-finite loss at step {i}")

        # end-state eval (deterministic eval model, dense path so every
        # arm is scored by the IDENTICAL program)
        opc.TRAIN_COMMUTE = False
        opc.TRAIN_COMMUTE_IMPL = "0"
        emodel = define_G(cfg, train=False)
        out = jax.jit(lambda v, x: emodel.apply(v, x)[2])(
            {"params": p, "batch_stats": bs}, val_p)
        cd = float(jax.jit(chamfer_metric)(out, val_g).mean())
        print(f"[{tag}] end val CD*1000 {cd:.4f}", flush=True)
        return traj, cd

    report = {"steps": args.steps, "batch": args.batch}
    t_d, cd_d = run_arm("dense", "0", 0)
    t_c, cd_c = run_arm("commute", "pallas", 0)
    t_s, cd_s = run_arm("dense-s1", "0", 1)

    t_d, t_c, t_s = map(np.asarray, (t_d, t_c, t_s))
    tail = slice(len(t_d) // 2, None)       # post-warmup half
    dev_c = float(np.abs(t_c[tail] - t_d[tail]).mean()
                  / np.abs(t_d[tail]).mean())
    dev_s = float(np.abs(t_s[tail] - t_d[tail]).mean()
                  / np.abs(t_d[tail]).mean())
    cd_dev_c = abs(cd_c - cd_d) / cd_d
    cd_dev_s = abs(cd_s - cd_d) / cd_d
    report.update({
        "traj": {"dense": t_d.tolist(), "commute": t_c.tolist(),
                 "dense_s1": t_s.tolist()},
        "val_cd1000": {"dense": cd_d, "commute": cd_c, "dense_s1": cd_s},
        "loss_dev_commute": round(dev_c, 4),
        "loss_dev_seed": round(dev_s, 4),
        "cd_dev_commute": round(cd_dev_c, 4),
        "cd_dev_seed": round(cd_dev_s, 4),
    })
    ok = dev_c <= max(1.5 * dev_s, 0.02) and cd_dev_c <= max(
        1.5 * cd_dev_s, 0.05)
    report["verdict"] = "PASS" if ok else "FAIL"
    print(f"loss dev: commute {dev_c:.4f} vs seed envelope {dev_s:.4f}",
          flush=True)
    print(f"val CD dev: commute {cd_dev_c:.4f} vs seed envelope "
          f"{cd_dev_s:.4f}", flush=True)
    print(f"COMMUTE_CONVERGE {report['verdict']}", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
