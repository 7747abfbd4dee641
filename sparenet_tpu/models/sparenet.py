"""SpareNet generator: style-based folding with double refinement.

TPU-native rebuild of models/sparenet_generator.py:12-391,530-579.
Architectural differences from the reference (same math, TPU shape):

  - the 32-primitive Python loop over per-primitive decoders
    (models/sparenet_generator.py:352-391) is a single ``nn.vmap`` over a
    leading primitive axis — 32 independent parameter sets, one XLA
    program, MXU-batched matmuls.
  - the mutating ``assign_adain_params`` protocol
    (models/sparenet_generator.py:831-849) becomes a functional style
    argument threaded into the vmapped GridDecoder.
  - channel-last layout throughout; clouds are [B, N, 3].

``train`` is a module attribute: construct with train=False for eval
(identical parameter structure).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.expansion_penalty import expansion_penalty, mean_mst_length_estimate
from ..ops.mds import (minimum_density_sample, minimum_density_sample_xyz,
                       gather_points)
from .layers import (
    EdgeConvResFeat,
    EdgeRes,
    GridDecoder,
    Linear,
    PointGenCon,
    PointNetRes,
    PointNetfeat,
    batch_norm_1d,
    grid_generation,
    num_adain_params,
)

_DEC_BOTTLENECK = 1026  # GridDecoder/PointGenCon default width


class SpareNetEncode(nn.Module):
    """Feature extractor + bottleneck head
    (models/sparenet_generator.py:85-120)."""

    bottleneck_size: int = 4096
    hide_size: int = 4096
    use_selayer: bool = False
    encode: str = "Pointfeat"
    train: bool = True

    @nn.compact
    def __call__(self, x):
        if self.encode == "Residualnet":
            x = EdgeConvResFeat(
                use_selayer=self.use_selayer, k=8,
                output_size=self.hide_size, hide_size=4096,
                train=self.train,
            )(x)
        else:
            x = PointNetfeat(
                hide_size=self.hide_size, use_selayer=self.use_selayer,
                train=self.train,
            )(x)
        x = Linear(self.bottleneck_size)(x)
        x = batch_norm_1d(self.train)(x)
        return nn.relu(x)


class _AdaInPointGenCon(nn.Module):
    """Per-primitive style MLP + AdaIN decoder
    (AdaInPointGenCon, models/sparenet_generator.py:425-460)."""

    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, grid_in, style):
        h = Linear(style.shape[-1])(style)
        h = nn.relu(h)
        ap = Linear(num_adain_params(_DEC_BOTTLENECK))(h)
        return GridDecoder(
            bottleneck_size=_DEC_BOTTLENECK,
            use_selayer=self.use_selayer,
            train=self.train,
        )(grid_in, ap)


class SpareNetDecode(nn.Module):
    """Style-based multi-primitive folding decoder
    (models/sparenet_generator.py:289-391).

    Returns the coarse cloud [B, num_points, 3]; primitive i owns the
    contiguous slice [i*S, (i+1)*S) of the point axis, matching the
    reference's torch.cat over the primitive loop.
    """

    num_points: int = 16384
    n_primitives: int = 32
    bottleneck_size: int = 4096
    use_adain: str = "share"
    use_selayer: bool = False
    train: bool = True

    @nn.compact
    def __call__(self, style):
        b = style.shape[0]
        grid = jnp.asarray(grid_generation(self.num_points, self.n_primitives))
        grid = (grid - 0.5) * 2.0                                # [S, 2]
        s = grid.shape[0]
        grid_b = jnp.broadcast_to(grid[None], (b, s, 2))

        if self.use_adain == "share":
            # one MLP emits AdaIN params consumed by every primitive
            # (models/sparenet_generator.py:312-329)
            h = Linear(self.bottleneck_size)(style)
            h = nn.relu(h)
            adain = Linear(num_adain_params(_DEC_BOTTLENECK))(h)

            vdec = nn.vmap(
                GridDecoder,
                in_axes=(None, None),
                out_axes=0,
                axis_size=self.n_primitives,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )(bottleneck_size=_DEC_BOTTLENECK, use_selayer=self.use_selayer,
              train=self.train)
            outs = vdec(grid_b, adain)                           # [P, B, S, 3]

        elif self.use_adain == "no_share":
            vdec = nn.vmap(
                _AdaInPointGenCon,
                in_axes=(None, None),
                out_axes=0,
                axis_size=self.n_primitives,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )(use_selayer=self.use_selayer, train=self.train)
            outs = vdec(grid_b, style)

        elif self.use_adain == "no_use":
            # concat style onto the grid (models/sparenet_generator.py:375-390)
            y = jnp.broadcast_to(style[:, None, :], (b, s, style.shape[-1]))
            y = jnp.concatenate([grid_b, y], axis=-1)
            vdec = nn.vmap(
                PointGenCon,
                in_axes=(None,),
                out_axes=0,
                axis_size=self.n_primitives,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )(bottleneck_size=_DEC_BOTTLENECK, use_selayer=self.use_selayer,
              train=self.train)
            outs = vdec(y)
        else:
            raise ValueError(f"unknown use_adain mode {self.use_adain!r}")

        # [P, B, S, 3] -> [B, P*S, 3] with primitive-contiguous point order
        outs = jnp.transpose(outs, (1, 0, 2, 3))
        return outs.reshape(b, self.n_primitives * s, 3)


class SpareNetRefine(nn.Module):
    """Expansion-penalty + MDS-resample + residual delta refiner
    (models/sparenet_generator.py:530-579). Shared between both refine
    passes (the reference reuses one module instance)."""

    num_points: int = 16384
    n_primitives: int = 32
    use_selayer: bool = False
    edgeres: bool = False
    train: bool = True
    # remat only the residual net: it holds the [B, 16384, 1024] global-
    # feature activations, while the MDS/MST fori_loops that precede it
    # must never be replayed in the backward (see cfg.TPU.remat).
    remat: bool = False
    # serving-mode NN-mean -> mean-MST-edge-length ratio; the ratio is
    # coarse-cloud-distribution dependent, so it is a PER-MODEL knob
    # (MSN carries its own; see ops/expansion_penalty.py). 1.33 is the
    # TRAINED-weights fit for SpareNet coarse clouds — ratio 1.326
    # +- 0.009 over val batches, halving the serving-vs-parity drift of
    # the random-init fit 3.18 (docs/SERVING_ENVELOPE.md; recalibrate
    # per checkpoint with scripts/calibrate_mml.py --weights).
    mml_calibration: float = 1.33
    # MDS implementation request for the resample (ops/mds.resolve_impl
    # applies the env override + mode defaults). "batched" here is the
    # SERVING-ALIGNED TRAINING mode (cfg.TRAIN.serving_aligned): the
    # refiner trains against the same batch-greedy selection it will
    # see in serving — measured both FASTER per step and BETTER on
    # post-alignment serving quality (docs/SERVING_ENVELOPE.md §4).
    mds_impl: str = "auto"

    @nn.compact
    def __call__(self, coarse, partial):
        """coarse [B, N, 3], partial [B, N_in, 3] ->
        (refined [B, N, 3], loss_mst scalar)."""
        b, n, _ = coarse.shape
        prim_size = self.num_points // self.n_primitives
        from ..ops import common as _opc
        if not self.train and _opc.FAST_MATH:
            # serving mode: only the mean MST edge length is consumed
            # (as the MDS density temperature); the per-edge penalty is
            # a training loss. The NN-mean estimate replaces the
            # sequential Prim's kernel (0.2 ms vs 6.8 ms at B=32; see
            # ops/expansion_penalty.py:mean_mst_length_estimate).
            mean_mst_dis = mean_mst_length_estimate(
                coarse, prim_size, calibration=self.mml_calibration)
            loss_mst = jnp.float32(0.0)
        else:
            dist, _, mean_mst_dis = expansion_penalty(coarse, prim_size, 1.5)
            loss_mst = jnp.mean(dist)

        # flag channel: 0 for generated, 1 for partial
        # (models/sparenet_generator.py:563-568)
        if not self.train and _opc.FAST_MATH:
            # serving: the batched MDS returns its per-round gathered
            # coordinates, and the flag channel is pure index math
            # (idx >= n <=> the row came from the partial block) — the
            # full-width gather_points over the base cloud disappears.
            cat_xyz = jnp.concatenate([coarse, partial], axis=1)
            idx, sel = minimum_density_sample_xyz(cat_xyz, n, mean_mst_dis,
                                                  impl=self.mds_impl)
            flag = (idx >= n).astype(coarse.dtype)[..., None]
            base = jnp.concatenate([sel, flag], axis=-1)  # [B, N, 4]
        else:
            inps = jnp.concatenate(
                [coarse, jnp.zeros((b, n, 1), coarse.dtype)], axis=-1
            )
            part = jnp.concatenate(
                [partial, jnp.ones(partial.shape[:2] + (1,), coarse.dtype)],
                axis=-1
            )
            base = jnp.concatenate([inps, part], axis=1)  # [B, N+N_in, 4]

            idx = minimum_density_sample(base[..., :3], n, mean_mst_dis,
                                         impl=self.mds_impl)
            base = gather_points(base, idx)               # [B, N, 4]

        res_cls = EdgeRes if self.edgeres else PointNetRes
        # pin the auto-name: nn.remat would otherwise prefix it
        # ("CheckpointPointNetRes_0"), forking the param tree from the
        # un-rematted checkpoint layout
        res_name = res_cls.__name__ + "_0"
        if self.remat:
            res_cls = nn.remat(res_cls)
        delta = res_cls(use_selayer=self.use_selayer, train=self.train,
                        name=res_name)(base)
        return base[..., :3] + delta, loss_mst


class SpareNetGenerator(nn.Module):
    """Full SpareNet: encode -> decode -> refine x2
    (models/sparenet_generator.py:12-82).

    __call__(partial [B, N_in, 3]) ->
        (coarse, middle, refine [B, N, 3], loss_mst).
    """

    num_points: int = 16384
    n_primitives: int = 32
    bottleneck_size: int = 4096
    hide_size: int = 4096
    use_selayer: bool = False
    use_adain: str = "share"
    encode: str = "Pointfeat"
    train: bool = True
    mml_calibration: float = 1.33  # serving-mode knob, see SpareNetRefine
    mds_impl: str = "auto"         # see SpareNetRefine.mds_impl
    # cfg.TPU.remat: rematerialize the EdgeConv encoder, the fold
    # decoder, and the refine residual nets in the backward pass. The
    # edge tensors ([B, N, k, C]), the 32x [B, S, 1026] fold
    # activations, and the [B, 16384, 1024] residual features are the
    # three HBM hogs of the training step; recomputing them costs one
    # extra forward of those stages and unlocks batch 32 on one chip.
    remat: bool = False

    def setup(self):
        enc_cls = nn.remat(SpareNetEncode) if self.remat else SpareNetEncode
        dec_cls = nn.remat(SpareNetDecode) if self.remat else SpareNetDecode
        self.encoder = enc_cls(
            bottleneck_size=self.bottleneck_size,
            hide_size=self.hide_size,
            use_selayer=self.use_selayer,
            encode=self.encode,
            train=self.train,
        )
        self.decoder = dec_cls(
            num_points=self.num_points,
            n_primitives=self.n_primitives,
            bottleneck_size=self.bottleneck_size,
            use_adain=self.use_adain,
            use_selayer=self.use_selayer,
            train=self.train,
        )
        self.refine = SpareNetRefine(
            num_points=self.num_points,
            n_primitives=self.n_primitives,
            use_selayer=self.use_selayer,
            train=self.train,
            mml_calibration=self.mml_calibration,
            mds_impl=self.mds_impl,
            remat=self.remat,
        )

    def __call__(self, partial):
        style = self.encoder(partial)
        coarse = self.decoder(style)
        middle, loss_mst = self.refine(coarse, partial)
        refine, _ = self.refine(middle, partial)
        return coarse, middle, refine, loss_mst
