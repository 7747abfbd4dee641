from . import checkpoint, logging, metrics, visualizer
from .logging import set_logger, writer_init
from .metrics import Metrics

__all__ = [
    "checkpoint", "logging", "metrics", "visualizer", "set_logger",
    "writer_init", "Metrics",
]
