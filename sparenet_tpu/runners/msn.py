"""MSN runner (rebuild of runners/msn_runner.py:16-93)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .atlasnet import _single_loss
from .base import apply_updates
from .sparenet import sparenetRunner


class msnRunner(sparenetRunner):
    """coarse + refine EMD/CD + 0.1 * expansion (runners/msn_runner.py:61-93)."""

    model_rng_names = ("grid",)

    def _train_impl(self, state, partial, gt, lr):
        rng, sub = jax.random.split(state.rng)
        rngs = {"grid": sub}

        def loss_fn(params):
            (coarse, refine, lm), upd = self.model_train.apply(
                {"params": params, "batch_stats": state.batch_stats}, partial,
                mutable=["batch_stats"], rngs=rngs,
            )
            c_l = _single_loss(self.config, coarse, gt)
            r_l = _single_loss(self.config, refine, gt)
            loss = c_l + r_l + lm * 0.1
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
        coarse, refine, _ = self.model_eval.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            partial, rngs={"grid": rng},
        )
        c_l = _single_loss(self.config, coarse, gt)
        r_l = _single_loss(self.config, refine, gt)
        return refine, c_l, r_l
