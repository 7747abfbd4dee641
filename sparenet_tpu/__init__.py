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
