"""Bisection profiler for the SpareNet-GAN training step.

Builds the production-scale GAN runner (B=8, 3000 -> 16384 pts, 8 views
@ 256^2) and times isolated variants of the assembled jitted step to
attribute wall-clock: full step, no-EMD (chamfer) step, renders alone,
generator vjp alone, discriminator alone, etc.

Usage:
    python scripts/profile_gan.py [--batch 8] [--radius 10] [--variants full,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_runner(batch, radius, metric, cgan):
    from sparenet_tpu.configs import default_config, cfg_update
    from sparenet_tpu.runners import get_runner
    from sparenet_tpu.utils.logging import set_logger

    cfg = default_config()
    cfg.DATASET.train_dataset = "Synthetic"
    cfg.DATASET.test_dataset = "Synthetic"
    cfg.DATASET.n_outpoints = 16384
    cfg.CONST.n_input_points = 3000
    cfg.CONST.num_workers = 0
    cfg.NETWORK.model_type = "SpareNet"
    cfg.NETWORK.n_primitives = 32
    cfg.NETWORK.metric = metric
    cfg.NETWORK.use_consist_loss = True
    # production GAN config (configs/sparenet_gan.yaml): SE layers ON.
    # Round-2 profiles ran with the default (False) — a slightly lighter
    # generator; r3 numbers are the true production module.
    cfg.NETWORK.use_selayer = True
    cfg.RENDER.img_size = 256
    cfg.RENDER.radius_list = [radius]
    cfg.GAN.use_cgan = cgan
    cfg.GAN.use_fm = True
    cfg.GAN.use_im = True
    cfg.TRAIN.batch_size = batch
    cfg.TEST.batch_size = batch
    cfg.TPU.donate = False
    cfg.DATASETS.synthetic.n_train = batch
    cfg.DATASETS.synthetic.n_val = batch
    cfg.DIR.out_path = "/tmp/profile_gan_out"
    cfg_update(cfg, timestamp=False)
    logger = set_logger(None)
    runner = get_runner(cfg, gan=True)(cfg, logger)
    runner.epoch_idx = 1
    runner.lr = 1e-4
    runner.reset_meters()
    return runner


def timed(name, fn, *args, reps=2):
    # first call compiles
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts):8.3f} s   (first call {t_compile:.1f} s)",
          flush=True)
    return min(ts)


def scalarize(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x.astype(jnp.float32)) if x.dtype != jnp.int32
               else jnp.sum(x.astype(jnp.float32)) for x in leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--radius", type=float, default=10.0)
    ap.add_argument("--metric", default="emd")
    ap.add_argument("--cgan", action="store_true", default=False)
    ap.add_argument("--variants", default="full,chamfer,renders,gen_vjp,"
                    "gen_vjp_norender,d_step,img_loss,emd3")
    ap.add_argument("--trace", default="", help="xplane trace dir for full")
    ap.add_argument("--weights", default="", help="orbax ckpt dir: load a "
                    "TRAINED generator so the step is measured in the "
                    "spread-cloud (mid-training) regime instead of the "
                    "degenerate tanh-init regime (VERDICT r2 weak #5)")
    args = ap.parse_args()
    variants = set(args.variants.split(","))

    print(f"devices: {jax.devices()}", flush=True)
    runner = build_runner(args.batch, args.radius, args.metric, args.cgan)
    if args.weights:
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.weights))
        # device_put: orbax restores HOST numpy arrays; passing them to a
        # jitted step as args re-transfers ~850 MB through the tunnel on
        # EVERY call (~7.5 s/step measured) — pin them on device once
        runner.state = runner.state.replace(
            params=jax.device_put(payload["state"]["params"]),
            batch_stats=jax.device_put(payload["state"]["batch_stats"]))
        print(f"loaded trained generator: {args.weights}", flush=True)
    items = next(iter(runner.train_loader))
    _, labels, _, data = items
    batch = runner._put_batch({"partial_cloud": data["partial_cloud"],
                               "gtcloud": data["gtcloud"]})
    partial, gt = batch["partial_cloud"], batch["gtcloud"]
    labels_dev = jnp.asarray(labels, jnp.int32)
    lr = jnp.float32(1e-4)
    cfg = runner.config
    radius = float(args.radius)

    from sparenet_tpu.runners.sparenet import completion_loss
    from sparenet_tpu.ops.emd import emd_auction

    gstate, dstate = runner.state, runner.disc_state

    # ---------------- full assembled step ----------------
    if "full" in variants:
        step = jax.jit(lambda gs, ds, p, g, y, l: scalarize(
            runner._gan_impl(radius, gs, ds, p, g, y, l)[2:]))
        t = timed("full GAN step", step, gstate, dstate, partial, gt,
                  labels_dev, lr)
        if args.trace:
            with jax.profiler.trace(args.trace):
                jax.block_until_ready(step(gstate, dstate, partial, gt,
                                           labels_dev, lr))
            print(f"trace written to {args.trace}")
    if "full_donated" in variants:
        # production step donates the train states (runners/
        # sparenet_gan.py:105); donation halves peak HBM vs the
        # non-donating profile jit — measures whether slow steps are
        # XLA rematerializing under memory pressure
        stepd = jax.jit(
            lambda gs, ds, p, g, y, l: runner._gan_impl(
                radius, gs, ds, p, g, y, l),
            donate_argnums=(0, 1))
        gs2, ds2 = jax.tree_util.tree_map(jnp.copy, (gstate, dstate))
        t0 = time.perf_counter()
        out = stepd(gs2, ds2, partial, gt, labels_dev, lr)
        jax.block_until_ready(out)
        print(f"{'full GAN step (donated, compile)':34s} "
              f"{time.perf_counter() - t0:8.3f} s", flush=True)
        for _ in range(3):
            gs2, ds2 = out[0], out[1]
            t0 = time.perf_counter()
            out = stepd(gs2, ds2, partial, gt, labels_dev, lr)
            jax.block_until_ready(out)
            print(f"{'full GAN step (donated)':34s} "
                  f"{time.perf_counter() - t0:8.3f} s", flush=True)

    # ---------------- chamfer-metric step ----------------
    if "chamfer" in variants:
        import copy
        runner.config.NETWORK.metric = "chamfer"
        step = jax.jit(lambda gs, ds, p, g, y, l: scalarize(
            runner._gan_impl(radius, gs, ds, p, g, y, l)[2:]))
        timed("full GAN step (chamfer)", step, gstate, dstate, partial, gt,
              labels_dev, lr)
        runner.config.NETWORK.metric = args.metric

    # ---------------- 3x renders forward ----------------
    if "renders" in variants:
        def renders(p, g):
            a = runner.renderer.render_all_views(g, [radius])
            b = runner.renderer.render_all_views(p, [radius])
            return jnp.sum(a) + jnp.sum(b)
        timed("2x render fwd (gt+partial)", jax.jit(renders), partial, gt)

    # ---------------- generator forward+vjp with render ----------------
    def gen_outputs(params, bs, p, g):
        (coarse, middle, refine, lm), upd = runner.model_train.apply(
            {"params": params, "batch_stats": bs}, p,
            mutable=["batch_stats"])
        rec, c_l, r_l = completion_loss(cfg, coarse, middle, refine, lm, g)
        fake_imgs = runner.renderer.render_all_views(middle, [radius])
        return rec, fake_imgs

    if "gen_fwd" in variants:
        def gf(params, bs, p, g):
            rec, fimgs = gen_outputs(params, bs, p, g)
            return rec + jnp.sum(fimgs)
        timed("gen fwd only (rec+render)", jax.jit(gf),
              gstate.params, gstate.batch_stats, partial, gt)

    if "gen_vjp" in variants:
        def gv(params, bs, p, g):
            (rec, fimgs), vjp = jax.vjp(
                lambda q: gen_outputs(q, bs, p, g), params)
            (grads,) = vjp((jnp.float32(1.0), jnp.ones_like(fimgs)))
            return scalarize(grads) + rec
        timed("gen fwd+vjp (rec+render)", jax.jit(gv),
              gstate.params, gstate.batch_stats, partial, gt)

    if "gen_vjp_norender" in variants:
        def gen_outputs2(params, bs, p, g):
            (coarse, middle, refine, lm), upd = runner.model_train.apply(
                {"params": params, "batch_stats": bs}, p,
                mutable=["batch_stats"])
            rec, c_l, r_l = completion_loss(cfg, coarse, middle, refine, lm, g)
            return rec

        def gv2(params, bs, p, g):
            rec, vjp = jax.vjp(lambda q: gen_outputs2(q, bs, p, g), params)
            (grads,) = vjp(jnp.float32(1.0))
            return scalarize(grads) + rec
        timed("gen fwd+vjp (rec only)", jax.jit(gv2),
              gstate.params, gstate.batch_stats, partial, gt)

    # ---------------- D step alone ----------------
    if "d_step" in variants:
        v = cfg.RENDER.n_views
        imgs = jnp.ones((args.batch, 256, 256, 2 * v), jnp.float32)

        def dstep(ds, ri, fi, y):
            def d_loss_fn(dparams):
                s = ds.replace(params=dparams)
                pr, s = runner._apply_disc(s, ri, y, jax.random.PRNGKey(0))
                pf, s = runner._apply_disc(s, fi, y, jax.random.PRNGKey(1))
                return jnp.mean((pr - 1.0) ** 2) + jnp.mean(pf ** 2)
            l, grads = jax.value_and_grad(d_loss_fn)(ds.params)
            return l + scalarize(grads)
        timed("D step (2 fwd + grad)", jax.jit(dstep), dstate, imgs, imgs,
              labels_dev)

    # ---------------- img loss grad ----------------
    if "img_loss" in variants:
        v = cfg.RENDER.n_views
        fimgs = jnp.ones((args.batch, 256, 256, v), jnp.float32)
        iimgs = jnp.ones((args.batch, 256, 256, v), jnp.float32)

        def il(fi, ii, y):
            def loss(f):
                pair = jnp.concatenate([ii, f], axis=-1)
                (pf, feats), _ = runner._apply_disc(
                    dstate, pair, y, jax.random.PRNGKey(0), feat=True)
                return jnp.mean((pf - 1.0) ** 2) + sum(
                    jnp.mean(x ** 2) for x in feats)
            g = jax.grad(loss)(fi)
            return jnp.sum(g)
        timed("img-loss grad through D", jax.jit(il), fimgs, iimgs,
              labels_dev)

    # ------- 3x EMD on REAL generator outputs (hard auction case) -------
    if "emd_real" in variants:
        outs = runner.model_eval.apply(
            {"params": gstate.params, "batch_stats": gstate.batch_stats},
            partial)
        coarse, middle, refine = [jax.lax.stop_gradient(o)
                                  for o in outs[:3]]
        coarse, middle, refine, gt_d = map(
            jax.block_until_ready, (coarse, middle, refine, gt))

        def e3r(c, m, r, g):
            t = 0.0
            for a in (c, m, r):
                d, _ = emd_auction(a, g, 0.005, 50)
                t = t + jnp.mean(jnp.sqrt(d))
            return t
        timed("3x EMD on generator outputs", jax.jit(e3r),
              coarse, middle, refine, gt_d)

        # unassigned-count trajectory for the ladder
        for iters in (1, 3, 8, 20, 50):
            _, a = emd_auction(coarse, gt_d, 0.005, iters)
            uniq = int(jnp.sum(jnp.zeros(a.shape).at[
                jnp.arange(a.shape[0])[:, None], jnp.maximum(a, 0)
            ].max(1.0)))
            print(f"  coarse-vs-gt iters={iters:3d}: duplicate targets "
                  f"{a.size - uniq}", flush=True)

    # ---------------- 3x EMD ----------------
    if "emd3" in variants:
        def e3(a, g):
            t = 0.0
            for _ in range(3):
                d, _ = emd_auction(a, g, 0.005, 50)
                t = t + jnp.mean(jnp.sqrt(d))
                a = a + 1e-6
            return t
        timed("3x auction EMD fwd (n=16384)", jax.jit(e3), gt, gt)

        def e3g(a, g):
            def f(x):
                t = 0.0
                y = x
                for _ in range(3):
                    d, _ = emd_auction(y, g, 0.005, 50)
                    t = t + jnp.mean(jnp.sqrt(d))
                    y = y + 1e-6
                return t
            return jnp.sum(jax.grad(f)(a))
        timed("3x auction EMD fwd+grad", jax.jit(e3g), gt, gt)


if __name__ == "__main__":
    main()
