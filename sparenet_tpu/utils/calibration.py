"""Serving-mode mml auto-calibration.

The serving path replaces the exact Prim's MST mean edge length (the
MDS density temperature t = 5*mml^2, cuda/MDS/MDS_cuda.cu:114-133;
cuda/expansion_penalty/expansion_penalty_cuda.cu:45-149) with a cheap
per-primitive NN-mean estimate scaled by a calibration ratio
(ops/expansion_penalty.py:mean_mst_length_estimate). That ratio is
strongly coarse-cloud-distribution dependent — measured 1.33 (trained
SpareNet) to 5.65 (trained MSN), a 4.3x spread entering the temperature
quadratically (docs/SERVING_ENVELOPE.md §1) — so a stale constant is a
silent quality knob.

``fit_mml_ratio`` makes it self-calibrating: run exact Prim's ONCE on
the model's own coarse output (one val batch at checkpoint load,
~0.2 ms amortized) and fit the ratio. BaseRunner calls it automatically
when serving mode is on and weights are loaded (models_load ->
_maybe_autocalibrate_mml); the manual NETWORK.mml_calibration override
still wins, and scripts/calibrate_mml.py remains for offline fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.expansion_penalty import (expansion_penalty,
                                     mean_mst_length_estimate)

__all__ = ["fit_mml_ratio"]


def fit_mml_ratio(coarse: jnp.ndarray, primitive_size: int) -> jnp.ndarray:
    """coarse [B, N, 3] -> scalar ratio = mean_b(Prim's mml / NN-mean).

    Feeding the result to mean_mst_length_estimate(..., calibration=r)
    reproduces the exact temperature on this coarse distribution up to
    the per-cloud spread of the ratio (measured std ~1-5%)."""
    coarse = jax.lax.stop_gradient(coarse)
    _, _, mml = expansion_penalty(coarse, primitive_size, 1.5)     # [B]
    nn_mean = mean_mst_length_estimate(coarse, primitive_size,
                                       calibration=1.0)            # [B]
    return jnp.mean(mml / jnp.maximum(nn_mean, 1e-12))
