"""SpareNet-TPU: a TPU-native point-cloud-completion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
microsoft/SpareNet (CVPR 2021, "Style-based Point Generator with
Adversarial Rendering for Point Cloud Completion"): four completion
models (SpareNet, AtlasNet, MSN, GRNet), a differentiable point->depth
renderer, adversarial training, and the full metric stack (Chamfer,
auction EMD, F-Score, FPD) — all designed TPU-first:

- compute path: jax / XLA / Pallas kernels (no CUDA, no torch)
- point-cloud ops with custom VJPs mirroring the reference CUDA
  extension zoo (reference: /root/reference/cuda/*)
- SPMD data parallelism over a jax.sharding.Mesh instead of
  torch.nn.DataParallel (reference: runners/base_runner.py:100-104)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SPARENET_PLATFORM"):
    # Explicit platform override (e.g. SPARENET_PLATFORM=cpu to drive
    # the CLIs without a TPU). The plain JAX_PLATFORMS env var is not
    # enough on images whose sitecustomize registers a TPU PJRT plugin
    # and overrides it, hence jax.config.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SPARENET_PLATFORM"])
