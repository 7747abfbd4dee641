"""GRNet: gridding -> 3D-CNN U-Net -> gridding reverse -> cubic features.

TPU-native rebuild of models/grnet_generator.py:8-136. Voxel volumes are
channel-last [B, X, Y, Z, C] (NDHWC); the fully-connected bottleneck
flattens the channel-last volume (weight layout differs from the torch
channel-first flatten — equivalent for a freshly-trained model).

RandomPointSampling (models/grnet_generator.py:115-136) filters zero
points and takes a random permutation subset; here that is a Gumbel
top-k over the valid mask — a static-shape uniform sample without
replacement from the valid points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.cubic_feature_sampling import cubic_feature_sampling
from ..ops.gridding import gridding, gridding_reverse
from .layers import Linear, kaiming_init


def random_point_sampling(key, pred_cloud, partial_cloud, n_points: int):
    """Uniform sample of n_points non-zero points from concat(partial, pred).

    Parity: RandomPointSampling (models/grnet_generator.py:115-136).
    """
    cloud = jnp.concatenate([partial_cloud, pred_cloud], axis=1)
    valid = jnp.sum(cloud, axis=-1) != 0.0                   # [B, N]
    b = cloud.shape[0]

    def one(k, pts, v):
        score = jnp.where(v, 0.0, -jnp.inf) + jax.random.gumbel(k, v.shape)
        _, idx = jax.lax.top_k(score, n_points)
        return pts[idx]

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, cloud, valid)


class _ConvBlock(nn.Module):
    """Conv3d(k=4, pad=2) + BN + LeakyReLU(0.2) + MaxPool(2)
    (models/grnet_generator.py:14-42)."""

    features: int
    train: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (4, 4, 4), padding=2,
                    kernel_init=kaiming_init)(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


class _DeconvBlock(nn.Module):
    """ConvTranspose3d(k=4, s=2, p=1) + BN + ReLU
    (models/grnet_generator.py:39-57): exact 2x spatial upsampling."""

    features: int
    train: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (4, 4, 4), strides=(2, 2, 2),
                             padding="SAME", use_bias=False,
                             kernel_init=kaiming_init)(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x)


class GRNet(nn.Module):
    """__call__(partial [B, N_in, 3]) -> (sparse [B, 2048, 3],
    dense [B, 16384, 3]) (models/grnet_generator.py:66-113)."""

    n_sampling_points: int = 2048
    gridding_scale: int = 64
    train: bool = True

    @nn.compact
    def __call__(self, partial):
        b = partial.shape[0]
        t = self.train

        vol64_l = gridding(partial, self.gridding_scale)[..., None]  # [B,64,64,64,1]
        vol32_l = _ConvBlock(32, t)(vol64_l)
        vol16_l = _ConvBlock(64, t)(vol32_l)
        vol8_l = _ConvBlock(128, t)(vol16_l)
        vol4_l = _ConvBlock(256, t)(vol8_l)

        flat = vol4_l.reshape(b, -1)                         # [B, 16384] at scale 64
        feat = nn.relu(Linear(2048)(flat))
        back = nn.relu(Linear(flat.shape[-1])(feat))
        vol4_r = back.reshape(vol4_l.shape) + vol4_l

        vol8_r = _DeconvBlock(128, t)(vol4_r) + vol8_l
        vol16_r = _DeconvBlock(64, t)(vol8_r) + vol16_l
        vol32_r = _DeconvBlock(32, t)(vol16_r) + vol32_l
        vol64_r = _DeconvBlock(1, t)(vol32_r) + vol64_l

        cloud = gridding_reverse(vol64_r[..., 0], self.gridding_scale)
        sparse = random_point_sampling(
            self.make_rng("sample"), cloud, partial, self.n_sampling_points
        )

        f32 = cubic_feature_sampling(sparse, vol32_r).reshape(
            b, self.n_sampling_points, -1)                   # [B,2048,256]
        f16 = cubic_feature_sampling(sparse, vol16_r).reshape(
            b, self.n_sampling_points, -1)                   # [B,2048,512]
        f8 = cubic_feature_sampling(sparse, vol8_r).reshape(
            b, self.n_sampling_points, -1)                   # [B,2048,1024]
        pf = jnp.concatenate([f32, f16, f8], axis=-1)        # [B,2048,1792]

        pf = nn.relu(Linear(1792)(pf))
        pf = nn.relu(Linear(448)(pf))
        pf = nn.relu(Linear(112)(pf))
        offsets = Linear(24)(pf).reshape(b, self.n_sampling_points * 8, 3)

        dense = (
            jnp.repeat(sparse, 8, axis=1) + offsets
        )                                                    # [B,16384,3]
        return sparse, dense
