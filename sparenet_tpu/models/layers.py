"""Shared model building blocks (flax.linen, channel-last).

TPU-native analogs of the reference's torch modules in
models/sparenet_generator.py. Convention: point features are
[B, N, C] (the reference is channel-first [B, C, N]); 1x1 Conv1d/Conv2d
become Dense layers over the trailing channel axis, which XLA lowers to
MXU matmuls batched over points.

Weight-init parity (utils/model_init.py:137-160):
  - Conv1d  -> normal(0, 0.02)
  - Conv2d/3d (incl. transpose) -> kaiming normal (fan_in, gain sqrt(2))
  - Linear  -> normal(0, 0.01), bias 0
  - BatchNorm1d -> scale ~ normal(1, 0.02), bias 0
  - BatchNorm2d/3d -> scale 1, bias 0
Helpers below tag each Dense with the init of the torch layer it replaces.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.edge_gather import gather_rows_scaled_max, gather_rows_sum
from ..ops.knn import get_graph_feature, knn_idx
from ..ops.pallas.edge_train_pallas import (edge_gather_stats,
                                            edge_gather_stats_supported)


def _use_gather_kernel(n: int, c: int) -> bool:
    """Gate for the fused Pallas neighbor gather+max (eval commute /
    extrema paths): TPU backend + the whole [N, C] table VMEM-resident."""
    from ..ops.pallas.gather_pallas import gather_rows_max_supported
    return (jax.default_backend() not in ("cpu", "gpu")
            and gather_rows_max_supported(n, c))

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

conv1d_init = nn.initializers.normal(stddev=0.02)
linear_init = nn.initializers.normal(stddev=0.01)
kaiming_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def bn1d_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class Conv1d(nn.Dense):
    """1x1 Conv1d replacement (init parity: normal(0, 0.02))."""

    kernel_init: Callable = conv1d_init


class Linear(nn.Dense):
    """nn.Linear replacement (init parity: normal(0, 0.01))."""

    kernel_init: Callable = linear_init


class Conv2d1x1(nn.Dense):
    """1x1 Conv2d replacement (init parity: kaiming normal)."""

    kernel_init: Callable = kaiming_init


class EdgeConv1x1(nn.Module):
    """Factorized DGCNN edge convolution.

    Mathematically identical to ``Conv2d1x1(out)(get_graph_feature(x))``
    — a 1x1 conv over edge features concat(x_j - x_i, x_i) [B, N, k, 2C]
    (models/sparenet_generator.py:880-906 + the stage convs at
    :188-242) — but the matmul runs per POINT instead of per edge:
    with W = [W1; W2],

        conv(e)[b, n, j] = (x W1)[b, idx_j] - (x W1)[b, n] + (x W2)[b, n]

    so the MXU work drops by the neighborhood factor k (8x here); only
    the gather + add touch the [B, N, k, C] edge tensor. Same kernel
    parameter shape/init as Conv2d1x1 (no bias, as in the reference).
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, idx, extrema: bool = False, commute=None,
                 need_mean: bool = False, parts: bool = False):
        c = x.shape[-1]
        kernel = self.param("kernel", kaiming_init,
                            (2 * c, self.features), jnp.float32)
        g1 = x @ kernel[:c]                               # x W1 [B,N,out]
        g2 = x @ kernel[c:]                               # x W2
        diff = g2 - g1
        if parts:
            # train-commute stage assembles the reductions itself
            return g1, diff
        if commute is not None:
            return self._commute(g1, diff, idx, commute, need_mean)
        if extrema:
            return self._extrema(g1, diff, idx)
        if self.dtype is not None:
            # serving mode: the neighbor gather is row-rate/bandwidth
            # bound on TPU (random [1, C] rows from HBM); bf16 rows
            # halve the traffic. The matmuls and the x W2 - x W1
            # difference stay f32.
            g1 = g1.astype(self.dtype)
            diff = diff.astype(self.dtype)
        gj = jnp.take_along_axis(
            g1[:, :, None, :], idx[..., None], axis=1)    # [B,N,k,out]
        return gj + diff[:, :, None, :]

    def _commute(self, g1, diff, idx, affine, need_mean):
        """Eval-mode max-commute: one C-wide gather, no edge tensor.

        ``affine`` = (a, b0): the downstream BatchNorm's eval affine per
        channel. Since a is a per-channel CONSTANT, pre-scaling g1 by a
        BEFORE the neighbor gather turns max-over-k of bn(e) into a max
        of gathered rows — correct for BOTH signs of a (a<0 rows are
        pre-negated, so max picks what bn's order reversal would):

            max_k bn(gj_k + diff) = max_k (a*gj_k) + a*diff + b0

        (exact up to float associativity vs the dense [B,N,k,C] chain).
        Downstream SE (positive per-(B,C) scale) and leaky-relu
        (increasing) also commute with max-over-k; the caller applies
        them to the returned z. With need_mean, also returns
        z_mean [B,C] = mean over all (point, neighbor) edges of bn(e)
        — the dense path's SE squeeze statistic — as a SECOND fused
        reduction over the same gathered rows (the in-degree scatter
        alternative was measured slower: XLA scatter-add over 768k
        duplicate indices cost more e2e than the whole commute win).
        """
        a, b0 = affine
        g1s = g1 * a
        n, k = idx.shape[1], idx.shape[2]
        if _use_gather_kernel(g1s.shape[1], g1s.shape[2]):
            # fused Pallas gather+max (+SE sum): the [N, C] table stays
            # VMEM-resident, the [B,N,k,C] edge tensor never exists.
            # 2.5-2.8x vs the XLA gather at the encoder's stage shapes
            # and exact in f32, so it replaces the bf16-row XLA gather
            # in serving mode too (f32 kernel 6.7 ms vs bf16 XLA 9.4 ms
            # at C=512; Mosaic cannot sublane-slice packed bf16 rows).
            from ..ops.pallas.gather_pallas import gather_rows_max
            if need_mean:
                m, s = gather_rows_max(g1s, idx, need_sum=True)
                mean_gj = s / jnp.float32(n * k)           # [B,C]
            else:
                m = gather_rows_max(g1s, idx)
            z = m + a * diff.astype(jnp.float32) + b0
            if not need_mean:
                return z
            z_mean = (mean_gj
                      + a * jnp.mean(diff.astype(jnp.float32), axis=1) + b0)
            return z, z_mean
        if self.dtype is not None:
            g1s = g1s.astype(self.dtype)
        gj = jnp.take_along_axis(
            g1s[:, :, None, :], idx[..., None], axis=1)    # [B,N,k,C]
        m = jnp.max(gj, axis=2)
        z = (m.astype(jnp.float32) + a * diff.astype(jnp.float32) + b0)
        if not need_mean:
            return z
        mean_gj = jnp.mean(gj.astype(jnp.float32), axis=(1, 2))   # [B,C]
        z_mean = (mean_gj
                  + a * jnp.mean(diff.astype(jnp.float32), axis=1) + b0)
        return z, z_mean

    def _extrema(self, g1, diff, idx):
        """Neighborhood extrema + edge mean without the edge tensor.

        Returns (e_max, e_min [B,N,C], e_mean [B,1,C]) where
        e_max/e_min are the per-channel max/min over the k neighbors of
        the edge values g1[idx] + diff, and e_mean is the global mean
        over all (point, neighbor) edges. Downstream eval-mode BN / SE /
        leaky-relu / max-over-k are per-channel monotone maps, so the
        stage output is recoverable from these alone — the [B, N, k, C]
        edge tensor (the encoder's HBM-traffic hot spot) never exists.

        One fused gather+max over concat(g1, -g1) rows yields both
        extrema in a single pass (the gather is row-rate bound, so the
        doubled row width is nearly free); the edge mean of g1[idx] is
        the in-degree-weighted mean of g1.
        """
        b, n, _ = g1.shape
        k = idx.shape[-1]
        gpm = jnp.concatenate([g1, -g1], axis=-1)         # [B,N,2C]
        dd = diff
        if self.dtype is not None:
            gpm = gpm.astype(self.dtype)
            dd = dd.astype(self.dtype)
        ext = jnp.max(jnp.take_along_axis(
            gpm[:, :, None, :], idx[..., None], axis=1), axis=2)
        e_max = ext[..., :self.features] + dd
        e_min = -ext[..., self.features:] + dd
        # in-degree of each source point over the k-NN graph
        deg = jnp.zeros((b, n), jnp.float32).at[
            jnp.arange(b)[:, None], idx.reshape(b, n * k)].add(1.0)
        mean_g = jax.lax.dot_general(
            deg[:, None, :], g1, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST) / (n * k)
        e_mean = mean_g + jnp.mean(diff, axis=1, keepdims=True)
        return e_max, e_min, e_mean


def serving_dtype(train: bool):
    """bf16 activation dtype for eval under SPARENET_FAST_MATH — the
    wide per-point conv chains (decoder folding at [B, 16384, 1026],
    residual refiner at [B, 16384, 1088]) are HBM-traffic bound, so
    halving the tensor width halves their cost; matmul accumulation
    stays f32 inside the MXU, norms accumulate statistics in f32."""
    from ..ops import common as _opc
    return jnp.bfloat16 if (_opc.FAST_MATH and not train) else None


class _ExternalStatsBN(nn.Module):
    """BatchNorm that consumes externally computed batch statistics.

    Variable layout (params scale/bias, batch_stats mean/var, running-
    stat EMA with momentum 0.9) is identical to ``nn.BatchNorm`` /
    ``batch_norm_2d``, so checkpoints are interchangeable with the
    dense EdgeConv stage — construct with name="BatchNorm_<i>" to claim
    the same tree slot. Returns the (slope, intercept) of the train-
    mode normalization as a per-channel affine: y = a * x + b0. Used by
    the train-commute EdgeConv stage, whose [B, N, k, C] edge-tensor
    statistics factorize in closed form (models/layers.py stage)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, mean, var):
        c = mean.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum)
                             * jax.lax.stop_gradient(mean))
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum)
                            * jax.lax.stop_gradient(var))
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b0 = bias - mean * a
        return a, b0


def batch_norm_1d(train: bool, name: str | None = None,
                  dtype: Any = None) -> nn.BatchNorm:
    """torch BatchNorm1d parity: eps 1e-5, momentum 0.1 (EMA decay 0.9)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        scale_init=bn1d_scale_init,
        name=name,
        dtype=dtype,
    )


def batch_norm_2d(train: bool, name: str | None = None,
                  dtype: Any = None) -> nn.BatchNorm:
    """torch BatchNorm2d/3d parity (scale init 1)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
        dtype=dtype,
    )


# ---------------------------------------------------------------------------
# AdaIN
# ---------------------------------------------------------------------------

def adaptive_instance_norm(x: jnp.ndarray, weight: jnp.ndarray,
                           bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """AdaIN over the point axis.

    x [B, N, C]; weight/bias [B, C] (externally generated style params).
    Parity: AdaptiveInstanceNorm1d (models/sparenet_generator.py:909-956)
    — F.batch_norm over a (1, B*C, N) reshape with training=True, i.e.
    instance statistics per (sample, channel) with biased variance.

    dtype-preserving: for bf16 x (serving mode) the statistics are
    accumulated in f32 but the normalization applies in bf16, so the
    [B, N, C] tensor never round-trips HBM at f32 width.
    """
    mean = jnp.mean(x, axis=1, keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square((x - mean.astype(x.dtype)).astype(jnp.float32)),
        axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return (xn * weight[:, None, :].astype(x.dtype)
            + bias[:, None, :].astype(x.dtype))


def grid_decoder_adain_sizes(bottleneck_size: int,
                             use_sine: bool = False) -> tuple[int, ...]:
    """Per-layer AdaIN feature counts of GridDecoder, in module
    registration order (models/sparenet_generator.py:1028-1030; SIREN
    variant registers four SineLayer AdaINs first, :996-1020)."""
    b = bottleneck_size
    if use_sine:
        # 4 SineLayer adains, then the (unused in sine forward) adain1-3
        return (b, b // 2, b // 4, b // 4, b, b // 2, b // 4)
    return (b, b // 2, b // 4)


def num_adain_params(bottleneck_size: int, use_sine: bool = False) -> int:
    """get_num_adain_params parity (models/sparenet_generator.py:815-828)."""
    return 2 * sum(grid_decoder_adain_sizes(bottleneck_size, use_sine))


def split_adain_params(params: jnp.ndarray, sizes: Sequence[int]):
    """assign_adain_params parity (models/sparenet_generator.py:831-849):
    per AdaIN layer, [mean(=bias), std(=weight)] consumed in order."""
    out = []
    off = 0
    for nf in sizes:
        bias = params[:, off:off + nf]
        weight = params[:, off + nf:off + 2 * nf]
        out.append((weight, bias))
        off += 2 * nf
    return out


# ---------------------------------------------------------------------------
# Squeeze-excitation
# ---------------------------------------------------------------------------

class SELayer(nn.Module):
    """Squeeze-excitation over [B, ..., C] (reduction 16).

    Parity: SELayer / SELayer1D (models/sparenet_generator.py:741-790);
    one channel-last module covers both the 1D and 2D variants (the
    average pool runs over all non-(batch, channel) axes).
    """

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, mean=None):
        axes = tuple(range(1, x.ndim - 1))
        # SE scale math stays f32 (tiny); only the final broadcast
        # multiply runs in x's dtype (bf16 under serving mode).
        # `mean` overrides the pooled statistic — used by the eval-mode
        # EdgeConv fast path, whose input is already max-reduced but
        # whose SE statistic must be the mean over all edges.
        if mean is None:
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)  # [B, C]
        y = mean.astype(jnp.float32)
        y = Linear(self.channel // self.reduction, use_bias=False)(y)
        y = nn.relu(y)
        y = Linear(self.channel, use_bias=False)(y)
        y = nn.sigmoid(y).astype(x.dtype)
        return x * y.reshape(y.shape[0:1] + (1,) * (x.ndim - 2) + y.shape[1:2])


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

class PointNetfeat(nn.Module):
    """PointNet global feature (models/sparenet_generator.py:245-286).

    x [B, N, 3] -> [B, hide_size] via 3 -> 64 -> 128 -> hide 1x1 convs
    (+BN, optional SE) and a global max pool.
    """

    hide_size: int = 4096
    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, x):
        train = self.train
        x = Conv1d(64)(x)
        x = batch_norm_1d(train)(x)
        if self.use_selayer:
            x = SELayer(64)(x)
        x = nn.relu(x)
        x = Conv1d(128)(x)
        x = batch_norm_1d(train)(x)
        if self.use_selayer:
            x = SELayer(128)(x)
        x = nn.relu(x)
        x = Conv1d(self.hide_size)(x)
        x = batch_norm_1d(train)(x)
        return jnp.max(x, axis=1)


class EdgeConvResFeat(nn.Module):
    """Channel-attentive EdgeConv encoder
    (models/sparenet_generator.py:123-242).

    x [B, N, 3] -> [B, output_size]: 4 EdgeConv stages (kNN graph on the
    *feature* space, k=8) with 1x1-conv residual shortcuts, concat of the
    4 scales, a wide conv5, then concat(max-pool, avg-pool).
    """

    k: int = 8
    hide_size: int = 4096
    output_size: int = 4096
    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, x):
        train = self.train
        h = self.hide_size

        # serving mode (eval + fast math): the [B, N, k, C] edge-tensor
        # chain runs in bf16 — it is HBM-traffic bound (measured ~24%
        # of stage time saved); stage outputs return to f32 so the
        # residual adds, concat and conv5 tail keep full precision
        from ..ops import common as _opc
        edt = jnp.bfloat16 if (_opc.FAST_MATH and not train) else None

        # Commute-kernel support must be decided ONCE for the whole
        # encoder: commute stages claim explicit BatchNorm_0..3 names
        # while the dense arm auto-names its BNs from 0, so a per-stage
        # "auto" gate that diverged across stages (possible at large N,
        # where only the widest stage exceeds the VMEM table limit)
        # would collide both naming schemes in one scope. Gate on the
        # widest stage (h//4) — if it fits, every stage fits.
        tc_kernel_ok = (jax.default_backend() not in ("cpu", "gpu")
                        and edge_gather_stats_supported(x.shape[1], h // 4))

        def stage(feat, out_ch, idx):
            nbr = knn_idx(feat, k=self.k)                  # [B,N,k]
            # no-op unless the caller asks for 'intermediates'; the
            # commute diagnostics (scripts/r5/diag_commute.py) read the
            # per-stage graphs to attribute arm divergence to near-tie
            # kNN flips vs kernel numerics
            self.sow("intermediates", f"nbr{idx}", nbr)
            conv = EdgeConv1x1(out_ch, dtype=edt)
            tc_impl = _opc.TRAIN_COMMUTE_IMPL if _opc.TRAIN_COMMUTE else "0"
            # "auto" uses the commute stage only where the Pallas
            # kernels carry it (the XLA arm is measured slower than
            # dense); "xla"/"pallas"/"1" force their arm for A/Bs
            if tc_impl == "auto" and not tc_kernel_ok:
                tc_impl = "0"
            if train and tc_impl != "0":
                # TRAIN-mode commuted stage: the edge tensor's BN batch
                # statistics factorize over e = g1[idx] + diff —
                #   sum(e)  = sum_m deg[m]*g1[m]    + k*sum(diff)
                #   sum(e2) = sum_m deg[m]*g1[m]^2  + 2*sum(diff*s1)
                #             + k*sum(diff^2),  s1 = per-point sum_j g1[idx_j]
                # so train BN reduces to a per-channel affine (a, b0)
                # computed from [B, N, C]-sized reductions, and the
                # BN -> SE(>0) -> leaky-relu -> max-over-k chain
                # commutes exactly as in the eval path: pre-scaling the
                # gather rows by `a` makes max-over-k pick the right
                # element for either sign of a. The [B, N, k, C] edge
                # tensor lives only inside the two gather reductions
                # (ops/edge_gather.py), whose VJPs scatter [B, N, C]
                # gradients — not a 5-pass dense-chain replay.
                g1, diff = conv(feat, nbr, parts=True)
                b, n, _ = feat.shape
                kk = self.k
                use_kernel = (tc_impl in ("1", "pallas", "auto")
                              and tc_kernel_ok)
                if use_kernel:
                    # one fused VMEM pass: per-point max/min/sum/sumsq
                    # over the k rows; VJP is a table-accumulate
                    # scatter kernel (no XLA scatter anywhere)
                    mxg, mng, s1, s2 = edge_gather_stats(g1, nbr)
                    sum_g_b = jnp.sum(s1, axis=1)          # [B,C]
                    sum_g2 = jnp.sum(s2, axis=(0, 1))
                else:
                    hp = jax.lax.Precision.HIGHEST
                    deg = jnp.zeros((b, n), jnp.float32).at[
                        jnp.arange(b)[:, None], nbr.reshape(b, n * kk)
                    ].add(1.0)
                    s1 = gather_rows_sum(g1, nbr)          # [B,N,C]
                    sum_g_b = jnp.einsum("bn,bnc->bc", deg, g1,
                                         precision=hp)
                    sum_g2 = jnp.einsum("bn,bnc->c", deg, g1 * g1,
                                        precision=hp)
                sum_d_b = jnp.sum(diff, axis=1)            # [B,C]
                cnt = b * n * kk
                mean = (jnp.sum(sum_g_b, 0) + kk * jnp.sum(sum_d_b, 0)) / cnt
                mean2 = (sum_g2 + 2.0 * jnp.sum(diff * s1, axis=(0, 1))
                         + kk * jnp.sum(diff * diff, axis=(0, 1))) / cnt
                var = mean2 - mean * mean
                a, b0 = _ExternalStatsBN(name=f"BatchNorm_{idx - 1}")(
                    mean, var)
                if use_kernel:
                    # max_j a*gj = a>=0 ? a*max_j gj : a*min_j gj
                    m = jnp.where(a >= 0, a * mxg, a * mng)
                else:
                    m = gather_rows_scaled_max(g1 * a, nbr)  # [B,N,C]
                z = m + a * diff + b0
                if self.use_selayer:
                    # SE squeeze of BN(e): mean over (N, k) per (B, C)
                    mean_e_b = (sum_g_b + kk * sum_d_b) / (n * kk)
                    z = SELayer(out_ch)(z, mean=a * mean_e_b + b0)
                return nn.leaky_relu(z, negative_slope=0.2)
            commute = (not train) and _opc.ENC_COMMUTE
            # The commute path only uses BN to probe its eval affine;
            # probe in f32 — the BN params/stats are stored f32, and a
            # bf16 probe would make `a` a difference of two bf16-rounded
            # values (cancellation noise multiplying every gathered
            # row). Only g1*a is cast to bf16, inside _commute.
            bn = batch_norm_2d(train, dtype=None if commute else edt)
            if commute:
                # eval max-commute path (see EdgeConv1x1._commute):
                # extract BN's eval affine by probing it at 0 and 1 —
                # BN eval is exactly affine per channel, and probing
                # keeps the module call order (= param naming)
                # identical to the dense path.
                probe = jnp.zeros((1, 1, 1, out_ch), jnp.float32)
                b0 = bn(probe)[0, 0, 0].astype(jnp.float32)
                a = (bn(jnp.ones_like(probe))[0, 0, 0]
                     .astype(jnp.float32) - b0)
                out = conv(feat, nbr, commute=(a, b0),
                           need_mean=self.use_selayer)
                if self.use_selayer:
                    z, z_mean = out
                    z = SELayer(out_ch)(z, mean=z_mean)
                else:
                    z = out
                z = nn.leaky_relu(z, negative_slope=0.2)
                return z.astype(jnp.float32)
            if not train and _opc.EVAL_FAST:
                # eval fast path: BN is affine per channel, SE scales
                # are positive, leaky-relu is increasing — so the
                # max-over-k commutes through the whole chain and only
                # the neighborhood extrema of the edge values are
                # needed. maximum(bn(e_max), bn(e_min)) picks e_max
                # exactly where the BN scale is >= 0 and e_min where it
                # is negative — the same element the dense [B,N,k,out]
                # path would select.
                e_max, e_min, e_mean = conv(feat, nbr, extrema=True)
                z = jnp.maximum(bn(e_max), bn(e_min))      # [B,N,out]
                if self.use_selayer:
                    z_mean = bn(e_mean.astype(e_max.dtype))[:, 0, :]
                    z = SELayer(out_ch)(z, mean=z_mean)
                z = nn.leaky_relu(z, negative_slope=0.2)
                return z.astype(jnp.float32)
            e = conv(feat, nbr)                            # [B,N,k,out]
            e = bn(e)
            if self.use_selayer:
                e = SELayer(out_ch)(e)
            e = nn.leaky_relu(e, negative_slope=0.2)
            return jnp.max(e, axis=2).astype(jnp.float32)  # [B,N,out_ch]

        x1 = stage(x, h // 16, 1)
        self.sow("intermediates", "x1", x1)

        x2_res = Conv1d(h // 16, use_bias=False)(x1)
        x2 = stage(x1, h // 16, 2) + x2_res
        self.sow("intermediates", "x2", x2)

        x3_res = Conv1d(h // 8, use_bias=False)(x2)
        x3 = stage(x2, h // 8, 3) + x3_res
        self.sow("intermediates", "x3", x3)

        x4_res = Conv1d(h // 4, use_bias=False)(x3)
        x4 = stage(x3, h // 4, 4) + x4_res
        self.sow("intermediates", "x4", x4)

        xc = jnp.concatenate([x1, x2, x3, x4], axis=-1)    # [B,N,h/2]
        # conv5 tail: [B, N, output/2] is the encoder's widest tensor;
        # serving mode runs it in bf16 (HBM-bound chain), pooled
        # features return to f32 for the bottleneck head
        xc = Conv1d(self.output_size // 2, use_bias=False, dtype=edt)(xc)
        # explicit name: the train-commute stages claim BatchNorm_0..3
        # explicitly, so the tail must pin the slot auto-naming would
        # otherwise hand out inconsistently between the two paths
        xc = batch_norm_1d(train, name="BatchNorm_4", dtype=edt)(xc)
        xc = nn.leaky_relu(xc, negative_slope=0.2)

        xmax = jnp.max(xc, axis=1).astype(jnp.float32)
        xavg = jnp.mean(xc, axis=1, dtype=jnp.float32)
        return jnp.concatenate([xmax, xavg], axis=-1)      # [B, output_size]


# ---------------------------------------------------------------------------
# Decoders / residual refiners
# ---------------------------------------------------------------------------

class PointGenCon(nn.Module):
    """Folding decoder without AdaIN (models/sparenet_generator.py:463-527).

    x [B, S, input_dim] -> [B, S, 3]; tanh output.
    """

    bottleneck_size: int = 1026
    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, x):
        train = self.train
        bs = self.bottleneck_size
        dt = serving_dtype(train)
        for ch in (bs, bs // 2, bs // 4):
            x = Conv1d(ch, dtype=dt)(x)
            x = batch_norm_1d(train, dtype=dt)(x)
            if self.use_selayer:
                x = SELayer(ch)(x)
            x = nn.relu(x)
        x = Conv1d(3, dtype=dt)(x)
        return jnp.tanh(x).astype(jnp.float32)


def _siren_init(in_features: int, omega_0: float, is_first: bool):
    """SineLayer weight init (models/sparenet_generator.py:1091-1106)."""
    if is_first:
        bound = 1.0 / in_features
    else:
        bound = np.sqrt(6.0 / in_features) / omega_0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GridDecoder(nn.Module):
    """AdaIN-modulated folding decoder
    (models/sparenet_generator.py:962-1062).

    x [B, S, input_dim], adain_params [B, num_adain_params] ->
    [B, S, 3]. Default: conv -> AdaIN -> BN -> (SE) -> relu per stage;
    final conv + tanh. With ``use_sine``: 4 SIREN layers
    sin(adain(omega * linear(x))) + a specially-initialized output conv
    (models/sparenet_generator.py:993-1026,1044-1051); the reference's
    adain1-3 still consume style parameters in that mode (they are
    registered but unused by the sine forward — sizing preserved by
    grid_decoder_adain_sizes).
    """

    bottleneck_size: int = 1026
    use_selayer: bool = False
    use_sine: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, x, adain_params):
        train = self.train
        bsz = self.bottleneck_size
        sizes = grid_decoder_adain_sizes(bsz, self.use_sine)
        style = split_adain_params(adain_params, sizes)

        if self.use_sine:
            omega = 30.0
            widths = (bsz, bsz // 2, bsz // 4, bsz // 4)
            for li, (ch, (w, b)) in enumerate(zip(widths, style[:4])):
                dense = nn.Dense(
                    ch, kernel_init=_siren_init(x.shape[-1], omega, li == 0))
                x = jnp.sin(adaptive_instance_norm(omega * dense(x), w, b))
            out_bound = float(np.sqrt(6.0 / bsz) / omega)

            def out_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype,
                                          -out_bound, out_bound)

            return nn.Dense(3, kernel_init=out_init)(x)

        dt = serving_dtype(train)
        for (ch, (w, b)) in zip(sizes, style):
            x = Conv1d(ch, dtype=dt)(x)
            x = adaptive_instance_norm(x, w, b)
            x = batch_norm_1d(train, dtype=dt)(x)
            if self.use_selayer:
                x = SELayer(ch)(x)
            x = nn.relu(x)
        x = Conv1d(3, dtype=dt)(x)
        return jnp.tanh(x).astype(jnp.float32)


class PointNetRes(nn.Module):
    """Residual refinement net (models/sparenet_generator.py:582-646).

    x [B, N, 4] -> [B, N, 3]; global maxpool feature tiled and concat
    with the 64-d point features; tanh output.
    """

    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, x):
        train = self.train
        dt = serving_dtype(train)

        def block(v, ch, se):
            v = Conv1d(ch, dtype=dt)(v)
            v = batch_norm_1d(train, dtype=dt)(v)
            if se and self.use_selayer:
                v = SELayer(ch)(v)
            return nn.relu(v)

        x = block(x, 64, True)
        pointfeat = x
        x = block(x, 128, True)
        x = Conv1d(1024, dtype=dt)(x)
        x = batch_norm_1d(train, dtype=dt)(x)
        g = jnp.max(x, axis=1, keepdims=True)              # [B,1,1024]
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], 1024))
        x = jnp.concatenate([g, pointfeat], axis=-1)       # [B,N,1088]
        x = block(x, 512, True)
        x = block(x, 256, True)
        x = block(x, 128, True)
        x = Conv1d(3, dtype=dt)(x)
        return jnp.tanh(x).astype(jnp.float32)


class EdgeRes(nn.Module):
    """EdgeConv residual refiner (models/sparenet_generator.py:649-738).

    Unused by default in the reference (self.edgeres = False,
    models/sparenet_generator.py:552) but ported for parity.
    """

    k: int = 8
    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, x):
        train = self.train

        def estage(feat, ch, se=True, act=True):
            e = get_graph_feature(feat, k=self.k)
            e = Conv2d1x1(ch, use_bias=False)(e)
            e = batch_norm_2d(train)(e)
            if se and self.use_selayer:
                e = SELayer(ch)(e)
            if act:
                e = nn.relu(e)
            return jnp.max(e, axis=2)

        x = estage(x, 64)
        pointfeat = x
        x = estage(x, 128)
        x = estage(x, 1024, se=False, act=False)
        g = jnp.max(x, axis=1, keepdims=True)
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], 1024))
        x = jnp.concatenate([g, pointfeat], axis=-1)
        x = estage(x, 512)
        x = estage(x, 256)
        x = estage(x, 128)
        # final: graph feature -> conv -> tanh -> max over k
        e = get_graph_feature(x, k=self.k)
        e = Conv2d1x1(3, use_bias=False)(e)
        e = jnp.tanh(e)
        return jnp.max(e, axis=2)


# ---------------------------------------------------------------------------
# folding grid
# ---------------------------------------------------------------------------

def grid_generation(num_points: int, nb_primitives: int) -> np.ndarray:
    """Fixed 2D folding grid, identical for every primitive.

    Parity: models/sparenet_generator.py:793-812 — grain_x/grain_y from
    2^(floor/ceil(log2(S)/2)) - 1; vertices (i/gx, j/gy), x-major.
    Returns [S, 2] float32 in [0, 1].
    """
    s = num_points / nb_primitives
    grain_x = 2 ** np.floor(np.log2(s) / 2) - 1
    grain_y = 2 ** np.ceil(np.log2(s) / 2) - 1
    xs = np.arange(int(grain_x) + 1) / grain_x
    ys = np.arange(int(grain_y) + 1) / grain_y
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)
