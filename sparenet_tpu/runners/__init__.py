"""Runner registry (analog of train.py:56-64's reflection import)."""

from __future__ import annotations

from .atlasnet import atlasnetRunner
from .base import BaseRunner, TrainState, lr_for_epoch, make_optimizer
from .grnet import grnetRunner
from .misc import AverageMeter
from .msn import msnRunner
from .sparenet import sparenetRunner, completion_loss
from .sparenet_gan import sparenetGANRunner

RUNNERS = {
    ("SpareNet", False): sparenetRunner,
    ("SpareNet", True): sparenetGANRunner,
    ("AtlasNet", False): atlasnetRunner,
    ("MSN", False): msnRunner,
    ("GRNet", False): grnetRunner,
}


def get_runner(cfg, gan: bool = False):
    """Resolve the runner class for (model_type, gan) — the reference does
    this by string reflection `{model}Runner` / `{model}GANRunner`
    (train.py:56-64)."""
    key = (cfg.NETWORK.model_type, bool(gan))
    if key not in RUNNERS:
        raise ValueError(
            f"No runner for model={cfg.NETWORK.model_type!r} gan={gan}")
    return RUNNERS[key]


__all__ = [
    "BaseRunner", "TrainState", "AverageMeter", "RUNNERS", "get_runner",
    "sparenetRunner", "sparenetGANRunner", "atlasnetRunner", "msnRunner",
    "grnetRunner", "completion_loss", "lr_for_epoch", "make_optimizer",
]
