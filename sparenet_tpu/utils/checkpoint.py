"""Checkpoint save/load via orbax.

Rebuild of utils/misc.py:54-109 with the survey-recommended upgrade: the
FULL train state (params + batch_stats + optimizer + epoch + best
metrics) is checkpointed, not just the generator weights — resume is
exact. Naming mirrors the reference: ``ckpt-best`` on metric improvement,
``ckpt-epoch-NNN`` every ``save_freq`` epochs.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from .metrics import Metrics


def _ckptr():
    return ocp.PyTreeCheckpointer()


def checkpoint_save(cfg, epoch_idx: int, metrics: Metrics,
                    best_metrics: Metrics | None, state: Any, logger=None):
    """Save on save_freq or improvement (utils/misc.py:80-109)."""
    improved = metrics.better_than(best_metrics)
    if epoch_idx % cfg.TRAIN.save_freq == 0 or improved:
        name = "ckpt-best" if improved else f"ckpt-epoch-{epoch_idx:03d}"
        path = os.path.abspath(os.path.join(cfg.DIR.checkpoints, name))
        payload = {
            "epoch_index": epoch_idx,
            "best_metrics": metrics.state_dict(),
            "state": state,
        }
        _ckptr().save(path, payload, force=True)
        if logger:
            logger.info("Saved checkpoint to %s ..." % path)
        if improved:
            best_metrics = metrics
    return best_metrics


def checkpoint_load(cfg, state_template: Any, logger=None):
    """Restore (init_epoch, best_metrics, state) from cfg.CONST.weights
    (utils/misc.py:54-77); returns (0, None, template) if unset."""
    if not cfg.CONST.weights:
        return 0, None, state_template
    path = os.path.abspath(cfg.CONST.weights)
    payload = _ckptr().restore(
        path,
        item={
            "epoch_index": 0,
            "best_metrics": {n: 0.0 for n in Metrics.names()},
            "state": state_template,
        },
    )
    best = Metrics(cfg.TEST.metric_name, payload["best_metrics"])
    if logger:
        logger.info(
            "Recover complete. Current epoch = #%d; best metrics = %s."
            % (payload["epoch_index"], best)
        )
    return payload["epoch_index"], best, payload["state"]
