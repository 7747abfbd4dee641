"""Adversarial-rendering discriminators + spectral normalization.

TPU-native rebuild of models/sparenet_discriminator.py:13-211.
Images are channel-last [B, H, W, C] (C = 2 * n_views of stacked depth
maps, reference utils/model_init.py:66-76).

Spectral norm follows the reference's custom power-iteration wrapper
(models/sparenet_discriminator.py:160-211): one iteration per forward,
u/v persisted (here in a 'spectral' variable collection), sigma
differentiable through the weight only.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import kaiming_init

disc_conv_init = nn.initializers.normal(stddev=0.02)  # init_weights_D parity
disc_bn_scale_init = (
    lambda key, shape, dtype=jnp.float32:
    1.0 + 0.02 * jax.random.normal(key, shape, dtype)
)


def _l2normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SNConv(nn.Module):
    """Spectral-normalized 2D convolution (stride/padding configurable).

    Parity: SpectralNorm(nn.Conv2d(...)) with power_iterations=1
    (models/sparenet_discriminator.py:160-211).
    """

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    strides: tuple[int, int] = (2, 2)
    padding: int = 1
    use_bias: bool = True
    update_stats: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", disc_conv_init,
                            (kh, kw, cin, self.features))
        # power-iteration state on the [out, in*kh*kw] matrix view
        height = self.features
        width = kh * kw * cin
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(
                jax.random.normal(self.make_rng("params")
                                  if self.has_rng("params") else
                                  jax.random.PRNGKey(0), (height,))),
        )
        w_mat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(height, width)
        w_stop = jax.lax.stop_gradient(w_mat)
        u = u_var.value
        v = _l2normalize(w_stop.T @ u)
        u_new = _l2normalize(w_stop @ v)
        if self.update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = u_new @ (w_mat @ v)          # grads flow through w_mat only
        kernel_sn = kernel / sigma

        y = jax.lax.conv_general_dilated(
            x, kernel_sn,
            window_strides=self.strides,
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class SNDense(nn.Module):
    """Spectral-normalized Dense (torch utils.spectral_norm(nn.Linear))."""

    features: int
    update_stats: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (cin, self.features))
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(
                jax.random.normal(jax.random.PRNGKey(0), (self.features,))),
        )
        w_stop = jax.lax.stop_gradient(kernel.T)             # [out, in]
        u = u_var.value
        v = _l2normalize(w_stop.T @ u)
        u_new = _l2normalize(w_stop @ v)
        if self.update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = u_new @ (kernel.T @ v)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ (kernel / sigma) + bias


class PatchDiscriminator(nn.Module):
    """6 stride-2 SN conv blocks + 1-channel adv head + global avg pool
    (models/sparenet_discriminator.py:13-81).

    __call__(img [B,H,W,C]) -> validity [B,1]; with feat=True also
    returns the first four feature maps for the FM loss.
    """

    train: bool = True

    @nn.compact
    def __call__(self, img, feat: bool = False, y=None):
        feats = []
        x = img
        channels = (16, 32, 64, 128, 256, 512)
        for i, ch in enumerate(channels):
            x = SNConv(ch, (4, 4), (2, 2), 1,
                       update_stats=self.train)(x)
            if i > 0:  # first block has no normalization
                x = nn.BatchNorm(
                    use_running_average=not self.train, momentum=0.9,
                    epsilon=1e-5, scale_init=disc_bn_scale_init,
                )(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            if i < 4:
                feats.append(x)
        validity = SNConv(1, (3, 3), (1, 1), 1, use_bias=False,
                          update_stats=self.train)(x)
        validity = jnp.mean(validity, axis=(1, 2))           # [B, 1]
        if feat:
            return validity, feats
        return validity


class ProjectionD(nn.Module):
    """cGAN projection discriminator
    (models/sparenet_discriminator.py:84-153): 4 SN conv blocks
    (k=3, s=2) with Dropout2d(0.25) and the reference's BatchNorm2d
    eps=0.8 quirk, SN linear head, label-embedding inner product.
    """

    num_classes: int = 0
    train: bool = True

    @nn.compact
    def __call__(self, img, feat: bool = False, y=None):
        feats = []
        x = img
        for i, ch in enumerate((16, 32, 64, 128)):
            x = SNConv(ch, (3, 3), (2, 2), 1, update_stats=self.train)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            x = nn.Dropout(0.25, broadcast_dims=(1, 2),
                           deterministic=not self.train)(x)
            if i > 0:
                # nn.BatchNorm2d(out_filters, 0.8): positional 0.8 lands on
                # eps (models/sparenet_discriminator.py:110) — kept as-is.
                x = nn.BatchNorm(
                    use_running_average=not self.train, momentum=0.9,
                    epsilon=0.8, scale_init=disc_bn_scale_init,
                )(x)
            feats.append(x)
        out = x.reshape(x.shape[0], -1)
        validity = SNDense(1, update_stats=self.train)(out)
        if y is not None and self.num_classes > 0:
            embed = SNEmbed(self.num_classes, out.shape[-1],
                            update_stats=self.train)(y)
            validity = validity + jnp.sum(embed * out, axis=1, keepdims=True)
        if feat:
            return validity, feats
        return validity


class SNEmbed(nn.Module):
    """Spectral-normalized embedding (torch spectral_norm(nn.Embedding))."""

    num_classes: int
    features: int
    update_stats: bool = True

    @nn.compact
    def __call__(self, y):
        table = self.param("embedding", nn.initializers.xavier_uniform(),
                           (self.num_classes, self.features))
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(
                jax.random.normal(jax.random.PRNGKey(0), (self.num_classes,))),
        )
        w_stop = jax.lax.stop_gradient(table)
        u = u_var.value
        v = _l2normalize(w_stop.T @ u)
        u_new = _l2normalize(w_stop @ v)
        if self.update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = u_new @ (table @ v)
        return (table / sigma)[y]
