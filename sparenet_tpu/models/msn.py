"""MSN: morphing decoder + expansion penalty + MDS resample + residual refine.

TPU-native rebuild of models/msn_generator.py:14-82.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.expansion_penalty import expansion_penalty, mean_mst_length_estimate
from ..ops.mds import (minimum_density_sample, minimum_density_sample_xyz,
                       gather_points)
from .atlasnet import PointEncoder
from .layers import PointGenCon, PointNetRes


class MSN(nn.Module):
    """__call__(partial [B, N_in, 3]) -> (coarse, refine [B, N, 3], loss_mst)
    (models/msn_generator.py:42-82)."""

    num_points: int = 16384
    bottleneck_size: int = 1024
    n_primitives: int = 32
    train: bool = True
    # serving-mode NN-mean -> mml ratio, calibrated on MSN's OWN
    # TRAINED coarse outputs: 5.65 +- 0.26 (synthetic-trained MSN,
    # scripts/calibrate_mml.py --weights; serving-vs-parity CD 1.59e-3
    # vs 1.94e-3 at the old cross-family default 3.18). The ratio is
    # strongly distribution dependent — random-init MSN measures 1.91,
    # trained SpareNet 1.33 — see ops/expansion_penalty.py and
    # docs/SERVING_ENVELOPE.md; recalibrate per checkpoint.
    mml_calibration: float = 5.65
    mds_impl: str = "auto"  # see SpareNetRefine.mds_impl (serving-aligned training)

    @nn.compact
    def __call__(self, partial, grids=None):
        """``grids`` [P, B, S, 2] overrides the random uniform grids —
        used for deterministic eval and cross-framework parity tests."""
        b = partial.shape[0]
        s = self.num_points // self.n_primitives
        style = PointEncoder(
            bottleneck_size=self.bottleneck_size, train=self.train
        )(partial)

        rand_grid = grids if grids is not None else jax.random.uniform(
            self.make_rng("grid"), (self.n_primitives, b, s, 2),
            dtype=partial.dtype,
        )
        y = jnp.broadcast_to(style[None, :, None, :],
                             (self.n_primitives, b, s, style.shape[-1]))
        y = jnp.concatenate([rand_grid, y], axis=-1)

        vdec = nn.vmap(
            PointGenCon,
            in_axes=(0,),
            out_axes=0,
            axis_size=self.n_primitives,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )(bottleneck_size=2 + self.bottleneck_size, train=self.train)
        outs = vdec(y)                                      # [P, B, S, 3]
        coarse = jnp.transpose(outs, (1, 0, 2, 3)).reshape(b, self.num_points, 3)

        from ..ops import common as _opc
        if not self.train and _opc.FAST_MATH:
            # serving mode: only the mean MST edge length is consumed
            # (MDS temperature); see SpareNetRefine for the rationale.
            mean_mst_dis = mean_mst_length_estimate(
                coarse, s, calibration=self.mml_calibration)
            loss_mst = jnp.float32(0.0)
        else:
            dist, _, mean_mst_dis = expansion_penalty(coarse, s, 1.5)
            loss_mst = jnp.mean(dist)

        # flag channels + MDS resample (models/msn_generator.py:70-79)
        if not self.train and _opc.FAST_MATH:
            # serving: fused selection+gather, flag from index math
            # (see SpareNetRefine)
            cat_xyz = jnp.concatenate([coarse, partial], axis=1)
            idx, sel = minimum_density_sample_xyz(
                cat_xyz, self.num_points, mean_mst_dis, impl=self.mds_impl)
            flag = (idx >= self.num_points).astype(coarse.dtype)[..., None]
            base = jnp.concatenate([sel, flag], axis=-1)
        else:
            gen = jnp.concatenate(
                [coarse, jnp.zeros((b, self.num_points, 1), coarse.dtype)],
                axis=-1
            )
            part = jnp.concatenate(
                [partial, jnp.ones(partial.shape[:2] + (1,), coarse.dtype)],
                axis=-1
            )
            base = jnp.concatenate([gen, part], axis=1)
            idx = minimum_density_sample(
                base[..., :3], self.num_points, mean_mst_dis,
                impl=self.mds_impl)
            base = gather_points(base, idx)

        delta = PointNetRes(train=self.train)(base)
        refine = base[..., :3] + delta
        return coarse, refine, loss_mst
