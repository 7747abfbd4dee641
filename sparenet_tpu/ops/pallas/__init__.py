"""Pallas TPU kernels for the hot ops.

Each kernel is semantically identical to its pure-XLA reference in
sparenet_tpu.ops; dispatchers pick Pallas on TPU backends and fall back
to XLA elsewhere (tests compare both on small shapes).
"""

from .mds_pallas import mds_pallas

__all__ = ["mds_pallas"]
