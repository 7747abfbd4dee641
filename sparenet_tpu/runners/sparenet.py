"""SpareNet runner (rebuild of runners/sparenet_runner.py:16-108).

The completion loss machinery is shared with the GAN runner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import define_G
from ..ops.chamfer import chamfer_raw
from ..ops.emd import emd_auction
from ..utils.metrics import Metrics, compute_all
from .base import BaseRunner, TrainState, apply_updates, make_optimizer
from .misc import AverageMeter


def completion_loss(cfg, coarse, middle, refine, expansion, gt):
    """Reconstruction loss (runners/sparenet_runner.py:67-108).

    Returns (total, coarse_loss, refine_loss) — EMD form uses
    sqrt(dist).mean() at eps=0.005 iters=50; chamfer form uses
    mean(d1)+mean(d2); + 0.1 * expansion penalty; + optional 0.5 *
    one-sided consistency CD.
    """
    metric = cfg.NETWORK.metric
    if metric == "chamfer":
        def cd(a):
            d1, d2, _, _ = chamfer_raw(a, gt)
            return jnp.mean(d1) + jnp.mean(d2)
        coarse_loss, middle_loss, refine_loss = cd(coarse), cd(middle), cd(refine)
    elif metric == "emd":
        def emd(a):
            dist, _ = emd_auction(a, gt, 0.005, 50)
            return jnp.mean(jnp.sqrt(dist))
        coarse_loss, middle_loss, refine_loss = emd(coarse), emd(middle), emd(refine)
    else:
        raise ValueError("unknown training metric")

    loss = coarse_loss + middle_loss + refine_loss + expansion * 0.1
    if cfg.NETWORK.use_consist_loss:
        d1, _, _, _ = chamfer_raw(refine, gt)
        loss = loss + jnp.mean(d1) * 0.5
    return loss, coarse_loss, refine_loss


class sparenetRunner(BaseRunner):
    """Reference class-name kept for the CLI's reflection-based import
    (train.py:56-64)."""

    model_rng_names = ()

    def __init__(self, config, logger):
        super().__init__(config, logger)
        self.losses = AverageMeter(["CoarseLoss", "RefineLoss"])
        self.test_losses = AverageMeter(["CoarseLoss", "RefineLoss"])
        self.test_metrics = AverageMeter(Metrics.names())

    def reset_meters(self):
        self.losses.reset()
        self.test_losses.reset()
        self.test_metrics = AverageMeter(Metrics.names())

    # ------------------------------------------------------------------

    def build_models(self):
        cfg = self.config
        self.model_train = define_G(cfg, train=True)
        self.model_eval = define_G(cfg, train=False)
        rng = jax.random.PRNGKey(cfg.CONST.seed)
        init_rngs = {"params": rng}
        for name in self.model_rng_names:
            rng, sub = jax.random.split(rng)
            init_rngs[name] = sub
        sample = jnp.zeros((2, cfg.CONST.n_input_points, 3), jnp.float32)
        variables = self.model_train.init(init_rngs, sample)
        self.tx = make_optimizer(cfg)
        params = variables["params"]
        self.state = TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
        )
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        self.logger.info("Parameters in net_G: %d." % n_params)

        donate = (0,) if cfg.TPU.donate else ()
        self._jit_train = jax.jit(self._train_impl, donate_argnums=donate)
        self._jit_val = jax.jit(self._val_impl)

    def _apply_train(self, params, batch_stats, partial, rngs):
        (coarse, middle, refine, lm), upd = self.model_train.apply(
            {"params": params, "batch_stats": batch_stats}, partial,
            mutable=["batch_stats"], rngs=rngs or None,
        )
        return (coarse, middle, refine, lm), upd["batch_stats"]

    def _train_impl(self, state, partial, gt, lr):
        rng, *subs = jax.random.split(state.rng, 1 + max(1, len(self.model_rng_names)))
        rngs = dict(zip(self.model_rng_names, subs))

        def loss_fn(params):
            (coarse, middle, refine, lm), new_bs = self._apply_train(
                params, state.batch_stats, partial, rngs)
            loss, c_l, r_l = completion_loss(
                self.config, coarse, middle, refine, lm, gt)
            return loss, (new_bs, c_l, r_l)

        (loss, (new_bs, c_l, r_l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state = apply_updates(
            self.tx, grads, state.opt_state, state.params, lr)
        new_state = state.replace(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            rng=rng, step=state.step + 1,
        )
        return new_state, loss, c_l, r_l

    def _eval_outputs(self, state, partial, rngs):
        coarse, middle, refine, lm = self.model_eval.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            partial, rngs=rngs or None,
        )
        return coarse, refine

    def _val_impl(self, state, partial, gt, rng):
        rngs = dict(zip(self.model_rng_names,
                        jax.random.split(rng, max(1, len(self.model_rng_names)))))
        coarse, refine = self._eval_outputs(state, partial, rngs)
        metric = self.config.NETWORK.metric
        if metric == "emd":
            cd_c, _ = emd_auction(coarse, gt, 0.005, 50)
            cd_r, _ = emd_auction(refine, gt, 0.005, 50)
            c_l = jnp.mean(jnp.sqrt(cd_c))
            r_l = jnp.mean(jnp.sqrt(cd_r))
        else:
            d1, d2, _, _ = chamfer_raw(coarse, gt)
            c_l = jnp.mean(d1) + jnp.mean(d2)
            d1, d2, _, _ = chamfer_raw(refine, gt)
            r_l = jnp.mean(d1) + jnp.mean(d2)
        return refine, c_l, r_l

    # ------------------------------------------------------------------

    def train_step(self, items):
        _, labels, _, data = items
        batch = self._put_batch(
            {"partial_cloud": data["partial_cloud"], "gtcloud": data["gtcloud"]})
        self.state, loss, c_l, r_l = self._jit_train(
            self.state, batch["partial_cloud"], batch["gtcloud"],
            jnp.float32(self.lr))
        self.loss = {
            "coarse_loss": float(c_l) * 1000,
            "refine_loss": float(r_l) * 1000,
            "rec_loss": float(loss),
        }
        self.losses.update([float(c_l) * 1000, float(r_l) * 1000])

    def val_step(self, items):
        _, labels, _, data = items
        batch = self._put_batch(
            {"partial_cloud": data["partial_cloud"], "gtcloud": data["gtcloud"]})
        rng = jax.random.PRNGKey(self.model_idx)
        refine, c_l, r_l = self._jit_val(
            self.state, batch["partial_cloud"], batch["gtcloud"], rng)
        self.test_losses.update([float(c_l) * 1000, float(r_l) * 1000])
        self.ptcloud = refine
        return compute_all(refine, batch["gtcloud"],
                           eps=float(self.config.TEST.emd_eps),
                           iters=int(self.config.TEST.emd_iters))
