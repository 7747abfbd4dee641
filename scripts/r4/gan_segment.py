"""GAN trained-segment run (VERDICT r3 task #6).

The adversarial mode (reference: runners/sparenet_gan_runner.py:192-346)
had only ever been *stepped and profiled* here, never trained. This
script runs a real multi-hundred-step GAN training segment at the
production configuration (B=8, 8 views @ 256^2, EMD + consistency rec
loss, cGAN projection discriminator), warm-starting the generator from
the round-4 converged flagship checkpoint, and records

  - per-step G/D loss trajectories (JSONL to --out/losses.jsonl),
  - the D real/fake balance over the segment,
  - a depth-map grid of gt / generated / partial at the final step,
  - a divergence verdict: all losses finite, errD bounded away from the
    0-everywhere collapse, rec loss not exploding vs its starting value.

Run ON TPU in background to natural completion:
  python scripts/r4/gan_segment.py --weights <orbax gen ckpt> \
      --steps 300 --out /tmp/gan_segment
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

# SMOKE=1: tiny-shape CPU plumbing check (random init allowed, chamfer,
# 64^2 images) — validates the script end-to-end without the device
_SMOKE = bool(int(os.environ.get("SMOKE", "0")))


def build_runner(batch, metric="emd", cgan=True):
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
    cfg.NETWORK.metric = "chamfer" if _SMOKE else metric
    cfg.NETWORK.use_consist_loss = True
    cfg.NETWORK.use_selayer = True
    cfg.NETWORK.encode = "Residualnet"
    cfg.NETWORK.use_adain = "share"
    cfg.RENDER.img_size = 64 if _SMOKE else 256
    # smoke: one radius = one compiled step variant
    cfg.RENDER.radius_list = [10.0] if _SMOKE else [5.0, 7.0, 10.0]
    cfg.GAN.use_cgan = cgan
    cfg.GAN.use_fm = True
    cfg.GAN.use_im = True
    cfg.TRAIN.batch_size = batch
    cfg.TEST.batch_size = batch
    # 512 train models -> 64 steps/epoch at B=8; the loader reshuffles
    # per epoch so a 300-step segment sees varied batches
    cfg.DATASETS.synthetic.n_train = 512
    cfg.DATASETS.synthetic.n_val = 8
    cfg.DIR.out_path = "/tmp/gan_segment_runner"
    cfg_update(cfg, timestamp=False)
    logger = set_logger(None)
    runner = get_runner(cfg, gan=True)(cfg, logger)
    runner.epoch_idx = 1
    runner.lr = float(cfg.TRAIN.learning_rate)
    runner.reset_meters()
    return runner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="orbax generator checkpoint (net_G TrainState)")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/gan_segment")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    if os.environ.get("FORCE_CPU"):  # sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")

    runner = build_runner(args.batch)

    # warm-start the generator from the trained flagship; D + both
    # optimizers start fresh (the reference's --weights path also
    # carries net_G only: utils/misc.py:54-77)
    if args.weights == "none" and _SMOKE:
        print("SMOKE: random-init generator", flush=True)
    else:
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.weights))
        state = payload["state"]
        runner.state = runner.state.replace(
            params=jax.device_put(state["params"]),
            batch_stats=jax.device_put(state["batch_stats"]))
        print(f"generator warm-started from {args.weights}", flush=True)

    losses_path = os.path.join(args.out, "losses.jsonl")
    hist = []
    step = 0
    rec0 = None
    with open(losses_path, "w") as f:
        while step < args.steps:
            for items in runner.train_loader:
                if step >= args.steps:
                    break
                runner.train_step(items)
                row = {"step": step, **{k: round(v, 5)
                                        for k, v in runner.loss.items()}}
                if rec0 is None:
                    rec0 = runner.loss["rec_loss"]
                f.write(json.dumps(row) + "\n")
                f.flush()
                hist.append(runner.loss)
                if step % 10 == 0:
                    print(f"[{step:4d}] rec {row['rec_loss']:.4f}  "
                          f"errG {row['errG']:.4f}  "
                          f"errG_D {row['errG_D']:.4f}  "
                          f"D_real {row['errD_real']:.4f}  "
                          f"D_fake {row['errD_fake']:.4f}", flush=True)
                step += 1

    # ---- divergence verdict ------------------------------------------
    last = hist[-50:]
    finite = all(np.isfinite(list(h.values())).all() for h in hist)
    mean = {k: float(np.mean([h[k] for h in last])) for k in last[0]}
    # MSE-GAN equilibrium: D real/fake errors ~0.25 each; collapse =
    # both pinned at ~0 (D wins) with errG_D stuck at ~1 (G dead)
    d_sum = mean["errD_real"] + mean["errD_fake"]
    collapsed = d_sum < 1e-3 and mean["errG_D"] > 0.9
    rec_exploded = mean["rec_loss"] > 5.0 * max(rec0, 1e-9)
    verdict = {
        "steps": len(hist),
        "finite": bool(finite),
        "collapsed": bool(collapsed),
        "rec_exploded": bool(rec_exploded),
        "rec_first": round(rec0, 5),
        "tail_mean": {k: round(v, 5) for k, v in mean.items()},
        "diverged": bool((not finite) or collapsed or rec_exploded),
    }
    print(json.dumps(verdict), flush=True)
    with open(os.path.join(args.out, "verdict.json"), "w") as f:
        json.dump(verdict, f, indent=1)

    # ---- depth-map grid of the final generator -----------------------
    import jax.numpy as jnp
    from sparenet_tpu.utils.visualizer import _save_gray_png

    items = next(iter(runner.val_loader))
    data = items[3]
    batch = runner._put_batch(
        {"partial_cloud": data["partial_cloud"], "gtcloud": data["gtcloud"]})
    (coarse, middle, refine, _) = runner.model_eval.apply(
        {"params": runner.state.params,
         "batch_stats": runner.state.batch_stats},
        batch["partial_cloud"])
    for name, cloud in (("gt", batch["gtcloud"]),
                        ("gen", middle),
                        ("partial", batch["partial_cloud"])):
        imgs = runner.renderer.render_all_views(
            jnp.asarray(cloud), radius_list=[10.0])  # [B, H, W, V]
        imgs = np.asarray(imgs)[0]
        grid = np.concatenate(
            [np.concatenate([imgs[..., i] for i in range(4)], axis=1),
             np.concatenate([imgs[..., i] for i in range(4, 8)], axis=1)],
            axis=0)
        _save_gray_png(os.path.join(args.out, f"depth_{name}.png"), grid)
    print(f"depth grids -> {args.out}", flush=True)
    print("DONE diverged=%s" % verdict["diverged"], flush=True)


if __name__ == "__main__":
    main()
