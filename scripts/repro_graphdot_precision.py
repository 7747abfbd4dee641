"""Repro/regression check: bf16 graph_dot under jax_default_matmul_precision=highest.

Config that crashed Mosaic before the fix (ops/common.py graph_dot):
SPARENET_FAST_MATH=1 freezes GRAPH_PRECISION=DEFAULT (single bf16 pass);
with the global matmul precision set to "highest" the bf16 dot_general
was lowered with fp32 contract precision -> Mosaic "Bad lhs type".
Also checks set_fast_math(False) now restores GRAPH_PRECISION.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARENET_FAST_MATH"] = "1"

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from sparenet_tpu.ops import common as opc
from sparenet_tpu.ops.knn import knn_idx

assert opc.GRAPH_PRECISION is jax.lax.Precision.DEFAULT

B, N, k = 4, 3000, 8
x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)

idx = jax.block_until_ready(jax.jit(lambda v: knn_idx(v, k=k))(x))
print("fast-math knn under matmul_precision=highest: OK", idx.shape)

opc.set_fast_math(False)
assert opc.GRAPH_PRECISION is jax.lax.Precision.HIGH, opc.GRAPH_PRECISION
assert opc.DISTANCE_PRECISION is jax.lax.Precision.HIGHEST

idx2 = jax.block_until_ready(jax.jit(lambda v: knn_idx(v, k=k))(x))
print("parity restore after set_fast_math(False): OK", idx2.shape)
print("REPRO PASS")
