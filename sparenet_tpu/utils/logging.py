"""Logging + TensorBoard writers (reference: utils/misc.py:39-51,112-130)."""

from __future__ import annotations

import logging
import os


def set_logger(filename: str | None = None) -> logging.Logger:
    """File + console logger (utils/misc.py:112-130)."""
    logger = logging.getLogger("sparenet_tpu")
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    formatter = logging.Formatter("%(levelname)s: - %(message)s")
    ch = logging.StreamHandler()
    ch.setLevel(logging.INFO)
    ch.setFormatter(formatter)
    logger.addHandler(ch)
    if filename:
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


class _NullWriter:
    """No-op SummaryWriter stand-in (keeps runners dependency-free)."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass

    def flush(self):
        pass


def writer_init(cfg):
    """(train_writer, val_writer) TensorBoard writers
    (utils/misc.py:39-51); falls back to no-op writers when tensorboard
    is unavailable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
        train_writer = SummaryWriter(os.path.join(cfg.DIR.logs, "train"))
        val_writer = SummaryWriter(os.path.join(cfg.DIR.logs, "test"))
        return train_writer, val_writer
    except Exception:
        return _NullWriter(), _NullWriter()
