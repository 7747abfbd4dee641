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

import jax
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
    (utils/misc.py:54-77); returns (0, None, template) if unset.

    A ``.pth`` path is treated as a REFERENCE checkpoint: the torch
    ``net_G`` state_dict is converted in place of params/batch_stats
    (optimizer state starts fresh — the reference never checkpoints it,
    utils/misc.py:96-104)."""
    if not cfg.CONST.weights:
        return 0, None, state_template
    if str(cfg.CONST.weights).endswith(".pth"):
        return _load_reference_pth(cfg, state_template, logger)
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
    # orbax restores HOST numpy leaves; left as-is they are re-uploaded
    # to the device on EVERY jitted step call that takes the state as an
    # argument (~7.5 s/call for the flagship through the axon tunnel —
    # measured in scripts/profile_gan.py before the fix). Pin on device
    # once here; train steps would self-heal after step 1 (outputs are
    # device arrays) but eval loops re-pay forever.
    return payload["epoch_index"], best, jax.device_put(payload["state"])


def _load_reference_pth(cfg, state_template: Any, logger=None):
    """Import a reference torch checkpoint (SpareNetGenerator only)."""
    import torch

    from .torch_import import _CONVERTERS

    mt = cfg.NETWORK.model_type
    if mt not in _CONVERTERS:
        raise NotImplementedError(
            f".pth import is not implemented for {mt}; convert the "
            "weights via utils/torch_import.py")
    payload = torch.load(os.path.abspath(cfg.CONST.weights),
                         map_location="cpu", weights_only=True)
    sd = payload.get("net_G", payload) if isinstance(payload, dict) \
        else payload
    kwargs = {"n_primitives": cfg.NETWORK.n_primitives}
    if mt == "SpareNet":
        kwargs.update(use_adain=cfg.NETWORK.use_adain,
                      encode=cfg.NETWORK.encode,
                      use_selayer=cfg.NETWORK.use_selayer)
    variables = _CONVERTERS[mt](sd, **kwargs)
    # same pin-on-device rule as the orbax branch: the converter emits
    # host arrays, and eval loops pass the state to jitted steps as an
    # argument every batch
    state = state_template.replace(
        params=jax.device_put(variables["params"]),
        batch_stats=jax.device_put(variables["batch_stats"]))
    epoch = payload.get("epoch_index", 0) if isinstance(payload, dict) else 0
    best = None
    if isinstance(payload, dict) and "best_metrics" in payload:
        bm = payload["best_metrics"]
        bm = {k: float(v) for k, v in dict(bm).items()
              if k in Metrics.names()}
        if bm:
            best = Metrics(cfg.TEST.metric_name,
                           {n: bm.get(n, 0.0) for n in Metrics.names()})
    if logger:
        logger.info(
            "Imported reference checkpoint %s (epoch #%d)."
            % (cfg.CONST.weights, epoch))
    return epoch, best, state
