"""GRNet runner (rebuild of runners/grnet_runner.py:16-94)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer_raw
from .atlasnet import _single_loss
from .base import apply_updates
from .sparenet import sparenetRunner


def _cd_mean(pred, gt):
    d1, d2, _, _ = chamfer_raw(pred, gt)
    return jnp.mean(d1) + jnp.mean(d2)


class grnetRunner(sparenetRunner):
    """Sparse CD + dense CD-or-EMD (runners/grnet_runner.py:64-94)."""

    model_rng_names = ("sample",)

    def _train_impl(self, state, partial, gt, lr):
        rng, sub = jax.random.split(state.rng)
        rngs = {"sample": sub}

        def loss_fn(params):
            (sparse, dense), upd = self.model_train.apply(
                {"params": params, "batch_stats": state.batch_stats}, partial,
                mutable=["batch_stats"], rngs=rngs,
            )
            c_l = _cd_mean(sparse, gt)
            r_l = _single_loss(self.config, dense, gt)
            loss = c_l + r_l
            return loss, (upd["batch_stats"], c_l, r_l)

        (loss, (new_bs, c_l, r_l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt_state = apply_updates(
            self.tx, grads, state.opt_state, state.params, lr)
        new_state = state.replace(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            rng=rng, step=state.step + 1,
        )
        return new_state, loss, c_l, r_l

    def _val_impl(self, state, partial, gt, rng):
        sparse, dense = self.model_eval.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            partial, rngs={"sample": rng},
        )
        c_l = _cd_mean(sparse, gt)
        r_l = _single_loss(self.config, dense, gt)
        return dense, c_l, r_l
