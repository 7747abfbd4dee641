"""AtlasNet: PointNet encoder + multi-primitive folding over random grids.

TPU-native rebuild of models/atlasnet_generator.py:14-76. The per-
primitive Python loop becomes an ``nn.vmap`` over the primitive axis;
the random uniform 2D grids (atlasnet_generator.py:44-49) come from an
explicit 'grid' PRNG stream instead of torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Linear, PointGenCon, PointNetfeat, batch_norm_1d


class PointEncoder(nn.Module):
    """PointNetfeat + Linear/BN/ReLU bottleneck
    (models/atlasnet_generator.py:61-76)."""

    bottleneck_size: int = 1024
    hide_size: int = 1024
    train: bool = True

    @nn.compact
    def __call__(self, x):
        x = PointNetfeat(hide_size=self.hide_size, train=self.train)(x)
        x = Linear(self.bottleneck_size)(x)
        x = batch_norm_1d(self.train)(x)
        return nn.relu(x)


class AtlasNet(nn.Module):
    """__call__(partial [B, N_in, 3]) -> completion [B, num_points, 3]
    (models/atlasnet_generator.py:38-58)."""

    num_points: int = 16384
    bottleneck_size: int = 1024
    n_primitives: int = 32
    train: bool = True

    @nn.compact
    def __call__(self, partial, grids=None):
        """``grids`` [P, B, S, 2] overrides the random uniform grids —
        used for deterministic eval and cross-framework parity tests."""
        b = partial.shape[0]
        s = self.num_points // self.n_primitives
        style = PointEncoder(
            bottleneck_size=self.bottleneck_size, train=self.train
        )(partial)

        # random uniform grids in [0, 1], one per (primitive, sample)
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
        outs = jnp.transpose(outs, (1, 0, 2, 3))
        return outs.reshape(b, self.num_points, 3)
