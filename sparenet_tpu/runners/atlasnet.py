"""AtlasNet runner (rebuild of runners/atlasnet_runner.py:16-93)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer_raw
from ..ops.emd import emd_auction
from ..utils.metrics import Metrics, compute_all
from .base import TrainState, apply_updates
from .misc import AverageMeter
from .sparenet import sparenetRunner


def _single_loss(cfg, pred, gt):
    if cfg.NETWORK.metric == "chamfer":
        d1, d2, _, _ = chamfer_raw(pred, gt)
        return jnp.mean(d1) + jnp.mean(d2)
    if cfg.NETWORK.metric == "emd":
        dist, _ = emd_auction(pred, gt, 0.005, 50)
        return jnp.mean(jnp.sqrt(dist))
    raise ValueError("unknown training metric")


class atlasnetRunner(sparenetRunner):
    """Single-output EMD/CD loss (runners/atlasnet_runner.py:64-93)."""

    model_rng_names = ("grid",)

    def __init__(self, config, logger):
        super().__init__(config, logger)
        self.losses = AverageMeter(["RefineLoss"])
        self.test_losses = AverageMeter(["RefineLoss"])

    def reset_meters(self):
        self.losses.reset()
        self.test_losses.reset()
        self.test_metrics = AverageMeter(Metrics.names())

    def _train_impl(self, state, partial, gt, lr):
        rng, sub = jax.random.split(state.rng)
        rngs = {"grid": sub}

        def loss_fn(params):
            refine, upd = self.model_train.apply(
                {"params": params, "batch_stats": state.batch_stats}, partial,
                mutable=["batch_stats"], rngs=rngs,
            )
            loss = _single_loss(self.config, refine, gt)
            return loss, upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state = apply_updates(
            self.tx, grads, state.opt_state, state.params, lr)
        new_state = state.replace(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            rng=rng, step=state.step + 1,
        )
        return new_state, loss, loss, loss

    def _val_impl(self, state, partial, gt, rng):
        refine = self.model_eval.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            partial, rngs={"grid": rng},
        )
        loss = _single_loss(self.config, refine, gt)
        return refine, loss, loss

    def train_step(self, items):
        _, _, _, data = items
        batch = self._put_batch(
            {"partial_cloud": data["partial_cloud"], "gtcloud": data["gtcloud"]})
        self.state, loss, _, r_l = self._jit_train(
            self.state, batch["partial_cloud"], batch["gtcloud"],
            jnp.float32(self.lr))
        self.loss = {"refine_loss": float(r_l) * 1000, "rec_loss": float(loss)}
        self.losses.update([float(r_l) * 1000])

    def val_step(self, items):
        _, _, _, data = items
        batch = self._put_batch(
            {"partial_cloud": data["partial_cloud"], "gtcloud": data["gtcloud"]})
        rng = jax.random.PRNGKey(self.model_idx)
        refine, _, r_l = self._jit_val(
            self.state, batch["partial_cloud"], batch["gtcloud"], rng)
        self.test_losses.update([float(r_l) * 1000])
        self.ptcloud = refine
        return compute_all(refine, batch["gtcloud"],
                           eps=float(self.config.TEST.emd_eps),
                           iters=int(self.config.TEST.emd_iters))
