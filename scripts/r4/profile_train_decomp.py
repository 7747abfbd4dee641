"""Fwd/bwd decomposition of the flagship SpareNet training step (VERDICT r3 #4).

Method: stop_gradient cut-points. A subclass of SpareNetGenerator
re-runs the exact forward but severs the backward at a chosen boundary;
XLA dead-code-eliminates everything upstream of the cut, so timing
differences between cuts isolate per-stage *backward* cost:

    enc_bwd    = t(full)      - t(sg=style)
    dec_bwd    = t(sg=style)  - t(sg=coarse)
    refine+loss_bwd = t(sg=coarse) - t(sg=all)
    fwd+opt    = t(sg=all)    (backward fully DCE'd; grads are zeros)

All timings are slope-timed (R=1 vs R=4 reps inside one jit, one sync
each) to remove the ~30-40 ms axon dispatch overhead
(scripts/slope_time.py). Run ON TPU in background to natural completion:

    B=24 METRIC=chamfer python scripts/r4/profile_train_decomp.py
    B=24 METRIC=emd     python scripts/r4/profile_train_decomp.py
    B=32 REMAT=1        python scripts/r4/profile_train_decomp.py

Reference hot loop being decomposed:
/root/reference/runners/base_runner.py:151-166,
/root/reference/runners/sparenet_runner.py:42-55.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

if os.environ.get("FORCE_CPU"):  # smoke-test off-TPU (sitecustomize
    jax.config.update("jax_platforms", "cpu")  # overrides JAX_PLATFORMS)

import jax.numpy as jnp
import numpy as np

R_HI = 4


class _SGGen:
    """Lazy holder so jax imports happen after env setup."""


def build_model(cfg, sg, remat):
    from flax import linen as nn
    from sparenet_tpu.models.sparenet import SpareNetGenerator

    class SGSpareNet(SpareNetGenerator):
        """SpareNetGenerator with a stop_gradient cut after a stage."""
        sg_point: str = ""

        def __call__(self, partial):
            style = self.encoder(partial)
            if self.sg_point == "style":
                style = jax.lax.stop_gradient(style)
            coarse = self.decoder(style)
            if self.sg_point == "coarse":
                coarse = jax.lax.stop_gradient(coarse)
            middle, loss_mst = self.refine(coarse, partial)
            refined, _ = self.refine(middle, partial)
            if self.sg_point == "all":
                coarse = jax.lax.stop_gradient(coarse)
                middle = jax.lax.stop_gradient(middle)
                refined = jax.lax.stop_gradient(refined)
                loss_mst = jax.lax.stop_gradient(loss_mst)
            return coarse, middle, refined, loss_mst

    n_out = int(os.environ.get("N_OUT", "16384"))
    prims = int(os.environ.get("PRIMS", "32"))
    width = int(os.environ.get("WIDTH", "4096"))
    return SGSpareNet(
        num_points=n_out, n_primitives=prims, bottleneck_size=width,
        hide_size=width, use_selayer=True, use_adain="share",
        encode="Residualnet", train=True, remat=remat, sg_point=sg,
    )


def main():
    batch = int(os.environ.get("B", "24"))
    metric = os.environ.get("METRIC", "chamfer")
    remat = bool(int(os.environ.get("REMAT", "0")))

    from sparenet_tpu.configs.defaults import default_config
    from sparenet_tpu.runners.base import apply_updates, make_optimizer
    from sparenet_tpu.runners.sparenet import completion_loss

    cfg = default_config()
    cfg.NETWORK.model_type = "SpareNet"
    cfg.NETWORK.metric = metric
    cfg.NETWORK.use_selayer = True
    cfg.NETWORK.encode = "Residualnet"

    n_in = int(os.environ.get("N_IN", "3000"))
    n_out = int(os.environ.get("N_OUT", "16384"))
    rs = np.random.RandomState(0)
    xs = [(jnp.asarray(rs.rand(batch, n_in, 3) - 0.5, jnp.float32),
           jnp.asarray(rs.rand(batch, n_out, 3) - 0.5, jnp.float32))
          for _ in range(R_HI)]

    base = build_model(cfg, "", remat)
    variables = base.init({"params": jax.random.PRNGKey(0)}, xs[0][0])
    tx = make_optimizer(cfg)
    opt0 = tx.init(variables["params"])

    def make_step(sg, with_grad=True):
        model = build_model(cfg, sg, remat)

        def one(params, bs, opt, partial, gt):
            def loss_fn(p):
                (c, m, r, lm), upd = model.apply(
                    {"params": p, "batch_stats": bs}, partial,
                    mutable=["batch_stats"])
                loss, _, _ = completion_loss(cfg, c, m, r, lm, gt)
                return loss, upd["batch_stats"]
            if not with_grad:
                loss, _ = loss_fn(params)
                return loss
            (loss, nbs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt = apply_updates(tx, grads, opt, params,
                                        jnp.float32(1e-4))
            # fold EVERY updated leaf into the scalar so no per-param
            # adam update (and hence no grad) is DCE'd; x*0.0 is not
            # foldable by XLA (NaN semantics), so the chain stays live
            probe = sum(jnp.sum(jnp.abs(l)) for l in
                        jax.tree_util.tree_leaves(params)) * 0.0
            return loss + probe

        def make_fn(r):
            # two HLO-size traps avoided: (1) params/opt are explicit
            # jit ARGUMENTS — closed-over device arrays are embedded as
            # constants (~660 MB of literals -> the axon remote-compile
            # 413 limit); (2) reps ride a lax.scan so the step body is
            # traced once, not unrolled R times. The scan still runs
            # the reps sequentially on device.
            def prog(params, bs, opt, inputs):
                stacked = (jnp.stack([p for p, _ in inputs]),
                           jnp.stack([g for _, g in inputs]))

                def body(acc, pg):
                    p, g = pg
                    return acc + one(params, bs, opt, p, g), None

                acc, _ = jax.lax.scan(body, jnp.float32(0), stacked)
                return acc

            jf = jax.jit(prog)
            return lambda inputs: jf(variables["params"],
                                     variables.get("batch_stats", {}),
                                     opt0, inputs)
        return make_fn

    def slope(name, make_fn):
        f1, fh = make_fn(1), make_fn(R_HI)
        float(f1(xs[:1])); float(fh(xs[:R_HI]))
        t1s, ths = [], []
        for _ in range(3):
            t0 = time.perf_counter(); float(f1(xs[:1]))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(fh(xs[:R_HI]))
            ths.append(time.perf_counter() - t0)
        per = (min(ths) - min(t1s)) / (R_HI - 1)
        print(f"{name:28s} {per * 1000:8.1f} ms/step", flush=True)
        return per

    print(json.dumps({"batch": batch, "metric": metric, "remat": remat}),
          flush=True)
    t_full = slope("full step (fwd+bwd+adam)", make_step(""))
    t_sg_style = slope("sg=style (no enc bwd)", make_step("style"))
    t_sg_coarse = slope("sg=coarse (no enc/dec bwd)", make_step("coarse"))
    t_sg_all = slope("sg=all (no model bwd)", make_step("all"))
    t_fwd = slope("fwd only (loss value)", make_step("", with_grad=False))

    print(json.dumps({
        "metric": f"train_decomp_{metric}_b{batch}" + ("_remat" if remat else ""),
        "full_ms": round(t_full * 1000, 1),
        "enc_bwd_ms": round((t_full - t_sg_style) * 1000, 1),
        "dec_bwd_ms": round((t_sg_style - t_sg_coarse) * 1000, 1),
        "refine_loss_bwd_ms": round((t_sg_coarse - t_sg_all) * 1000, 1),
        "fwd_opt_ms": round(t_sg_all * 1000, 1),
        "fwd_ms": round(t_fwd * 1000, 1),
        "clouds_per_sec": round(batch / t_full, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
