"""Model zoo + factory (reference: utils/model_init.py:94-134)."""

from __future__ import annotations

from ..configs import model_names as name
from .atlasnet import AtlasNet, PointEncoder
from .discriminator import PatchDiscriminator, ProjectionD, SNConv, SNDense
from .grnet import GRNet
from .msn import MSN
from .sparenet import (
    SpareNetDecode,
    SpareNetEncode,
    SpareNetGenerator,
    SpareNetRefine,
)

__all__ = [
    "AtlasNet", "MSN", "GRNet", "SpareNetGenerator", "SpareNetEncode",
    "SpareNetDecode", "SpareNetRefine", "PointEncoder",
    "PatchDiscriminator", "ProjectionD", "SNConv", "SNDense",
    "define_G", "define_D",
]


def define_G(cfg, train: bool = True):
    """Build the generator module for cfg.NETWORK.model_type
    (utils/model_init.py:94-134)."""
    mt = cfg.NETWORK.model_type
    # 0.0 = keep the family's own serving-mode mml calibration
    mml_kw = ({"mml_calibration": float(cfg.NETWORK.mml_calibration)}
              if cfg.NETWORK.mml_calibration > 0 else {})
    # serving-aligned training (cfg.TRAIN.serving_aligned): the TRAIN
    # model's refine loop uses the batch-greedy MDS; eval models keep
    # "auto" (exact in parity mode) — see configs/defaults.py
    if train and cfg.TRAIN.get("serving_aligned", False):
        mml_kw["mds_impl"] = "batched"
    if mt == name.MODEL_SPARENET:
        return SpareNetGenerator(
            num_points=cfg.DATASET.n_outpoints,
            bottleneck_size=4096,
            n_primitives=cfg.NETWORK.n_primitives,
            use_selayer=cfg.NETWORK.use_selayer,
            use_adain=cfg.NETWORK.use_adain,
            encode=cfg.NETWORK.encode,
            hide_size=4096,
            train=train,
            # remat only matters under grad; keep eval modules identical
            remat=bool(train and cfg.TPU.get("remat", False)),
            **mml_kw,
        )
    if mt == name.MODEL_ATLASNET:
        return AtlasNet(
            num_points=cfg.DATASET.n_outpoints,
            bottleneck_size=1024,
            n_primitives=cfg.NETWORK.n_primitives,
            train=train,
        )
    if mt == name.MODEL_MSN:
        return MSN(
            num_points=cfg.DATASET.n_outpoints,
            bottleneck_size=1024,
            n_primitives=cfg.NETWORK.n_primitives,
            train=train,
            **mml_kw,
        )
    if mt == name.MODEL_GRNET:
        return GRNet(
            n_sampling_points=cfg.NETWORK.n_sampling_points,
            train=train,
        )
    raise ValueError(f"Unknown model type {mt!r}")


def define_D(cfg, train: bool = True):
    """Build the discriminator (utils/model_init.py:58-90)."""
    if cfg.GAN.use_cgan:
        return ProjectionD(num_classes=cfg.DATASET.num_class, train=train)
    return PatchDiscriminator(train=train)
