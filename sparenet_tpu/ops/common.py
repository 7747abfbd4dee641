"""Shared helpers for the TPU op layer."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Matmul precision for pairwise-distance kernels. HIGHEST gives fp32-
# accurate distances (CUDA-reference parity for argmin/top-k picks);
# HIGH/DEFAULT trade ulp-level neighbor ties for substantial MXU speed
# (the kNN graph and chamfer argmins are robust to near-tie flips).
# Metrics (CD/EMD values) recompute distances from gathered points in
# full f32 regardless, so reported numbers keep fp32 parity.
_PREC = {
    "HIGHEST": jax.lax.Precision.HIGHEST,
    "HIGH": jax.lax.Precision.HIGH,
    "DEFAULT": jax.lax.Precision.DEFAULT,
}

# SPARENET_FAST_MATH=1: serving-mode speed knob — bf16-class distance
# matmuls and bf16 MDS coordinates. Parity mode (default) keeps fp32.
FAST_MATH = os.environ.get("SPARENET_FAST_MATH", "0") == "1"

# SPARENET_ENC_COMMUTE=1 enables the eval-mode EdgeConv max-commute
# path (models/layers.py): the stage's BN-affine / SE / leaky-relu /
# max-over-k chain commutes to a SINGLE C-wide neighbor gather+max of
# the pre-scaled per-point features — the [B, N, k, C] edge tensor
# never exists and, unlike EVAL_FAST, the gather width stays C. Exact
# up to float associativity. Hardware A/B (scripts/profile_enc_stage.py,
# B=32 v5e): wins at every stage width — dense-vs-commute per stage
# 8.4->8.0 / 8.7->8.3 / 12.8->10.9 / 24.4->20.8 ms bf16 (serving),
# smaller but positive in f32 (parity) — so ON by default in eval.
ENC_COMMUTE = os.environ.get("SPARENET_ENC_COMMUTE", "1") == "1"

# SPARENET_TRAIN_COMMUTE=1 enables the TRAIN-mode commuted EdgeConv
# stage (models/layers.py): BN batch statistics are computed in closed
# form from degree-weighted per-point sums (the edge tensor's channel
# stats factorize over gj = g1[idx] + diff), the BN affine is applied
# BEFORE the neighbor max via row pre-scaling, and the [B, N, k, C]
# edge tensor exists only transiently inside two gather reductions
# (ops/edge_gather.py) instead of being stored and re-walked by the
# 5-pass dense chain's backward. Exact in value up to f32 sum
# association; gradient routing at exact max ties is first-winner
# (dense jnp.max splits ties — measure-zero on real activations).
# Measured (r4, B=24 chamfer, v5e, scripts/r4/profile_train_decomp.py):
# the pure-XLA formulation LOSES to the dense chain — full step 887 vs
# 797 ms — because TPU XLA serializes its scalar-index scatters; the
# Pallas realization (ops/pallas/edge_train_pallas.py: VMEM-resident
# fused gather-reduce forward + table-accumulate scatter VJP) WINS the
# A/B at 723.9 vs 797.3 ms (1.10x, commit 3af040e).
# Default is "auto" (round 5): the Pallas commute stage wherever the
# kernels carry it, dense elsewhere. The round-4 free-running value-
# parity gate that blocked this flip was root-caused as measuring the
# wrong thing — the deviation is near-tie kNN graph flips seeded by
# ~1e-6/stage rounding of an exact identity, and the PURE-XLA commute
# arm fails it identically (docs/artifacts/r5/stage2/diag_commute.log).
# The accepted gate is semantic: kernel micro-parity (fwd bitwise /
# ulps, VJP cosine 1.0) + training-convergence A/B inside the
# seed-to-seed envelope (COMMUTE_CONVERGE PASS,
# scripts/r5/commute_converge_ab.py — end-state val CD dev 0.0125 vs
# seed envelope 0.1427).
# Values: "auto" (default) Pallas kernels where supported, else dense;
# "0" off; "1"/"pallas" force the kernels; "xla" forces the pure-XLA
# formulation (the measured-negative A/B arm).
TRAIN_COMMUTE_IMPL = os.environ.get("SPARENET_TRAIN_COMMUTE",
                                    "auto").lower()
TRAIN_COMMUTE = TRAIN_COMMUTE_IMPL != "0"

# SPARENET_EVAL_FAST=1 enables the eval-mode EdgeConv fast path
# (neighborhood-extrema formulation; see models/layers.py). Exact in
# value up to max-selection ties, but measured SLOWER on TPU v5e than
# the dense [B,N,k,C] chain (encoder 168 ms vs 106 ms @B=32: the
# concat(g, -g) extrema gather doubles the row-rate-bound gather
# traffic, which outweighs the skipped dense elementwise chain) — so it
# is OFF by default; kept as a tested alternative formulation.
EVAL_FAST = os.environ.get("SPARENET_EVAL_FAST", "0") == "1"

DISTANCE_PRECISION = _PREC[
    os.environ.get("SPARENET_DISTANCE_PRECISION",
                   "DEFAULT" if FAST_MATH else "HIGHEST").upper()
]

# Precision for the encoder's kNN GRAPH construction only (knn_idx /
# EdgeConv graphs). The reference built these graphs with the external
# knn_cuda wheel — a different algorithm with no bit-level parity
# contract — so the graph path defaults to HIGH (3-pass bf16, ~f32
# mantissa coverage at half the MXU passes of HIGHEST). Metric and loss
# kernels (chamfer/EMD) keep DISTANCE_PRECISION.
# NOTE (measured): inside Pallas, Mosaic runs f32 dot_generals at
# full 6-pass accuracy regardless of the precision= attribute; HIGH
# takes effect by casting the operands (see knn_pallas).
GRAPH_PRECISION = _PREC[
    os.environ.get("SPARENET_GRAPH_PRECISION",
                   "DEFAULT" if FAST_MATH else "HIGH").upper()
]


def set_distance_precision(name: str) -> None:
    """Set the pairwise-distance matmul precision ('HIGHEST' | 'HIGH' |
    'DEFAULT'). Takes effect for subsequently traced computations."""
    global DISTANCE_PRECISION
    DISTANCE_PRECISION = _PREC[name.upper()]


def set_graph_precision(name: str) -> None:
    """Set the kNN-graph matmul precision ('HIGHEST' | 'HIGH' | 'DEFAULT')."""
    global GRAPH_PRECISION
    GRAPH_PRECISION = _PREC[name.upper()]


def set_fast_math(on: bool = True) -> None:
    """Toggle serving-mode fast math (distance precision + MDS coords).

    Precisions are re-derived exactly as at import: an explicit
    SPARENET_DISTANCE_PRECISION / SPARENET_GRAPH_PRECISION env override
    survives the toggle (set_fast_math(False) used to clobber it)."""
    global FAST_MATH
    FAST_MATH = bool(on)
    set_distance_precision(os.environ.get(
        "SPARENET_DISTANCE_PRECISION", "DEFAULT" if on else "HIGHEST"))
    set_graph_precision(os.environ.get(
        "SPARENET_GRAPH_PRECISION", "DEFAULT" if on else "HIGH"))


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


def pick_chunk(n: int, m: int, budget_elems: int = 1 << 21, floor: int = 256) -> int:
    """Pick a query-axis chunk so a [chunk, m] tile stays within budget."""
    if n * m <= budget_elems:
        return n
    return max(min(floor, n), min(n, budget_elems // max(m, 1)))


def graph_dot(x: jnp.ndarray, yt: jnp.ndarray) -> jnp.ndarray:
    """<x, yt> (x [N, C] @ yt [C, M] -> f32 [N, M]) at GRAPH_PRECISION.

    The multi-pass bf16 splitting is done MANUALLY so the semantics are
    identical in XLA and inside Pallas kernels (Mosaic lowers f32
    dot_generals at full 6-pass accuracy regardless of the precision
    attribute — measured: HIGHEST and DEFAULT time identically there).
    HIGH = 3-term split (xh yh + xh yl + xl yh), ~f32 mantissa coverage
    at half the MXU passes of HIGHEST; DEFAULT = single bf16 pass.
    """
    dn = (((1,), (0,)), ((), ()))
    # Pin precision=DEFAULT on the bf16 passes: if it were left to the
    # global jax_default_matmul_precision and that is "highest", Mosaic
    # receives a bf16 matmul with fp32 contract precision and fails to
    # compile ("Bad lhs type").
    kw = dict(dimension_numbers=dn, preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    if GRAPH_PRECISION is jax.lax.Precision.HIGHEST:
        kw["precision"] = jax.lax.Precision.HIGHEST
        return jax.lax.dot_general(x, yt, **kw)
    xh = x.astype(jnp.bfloat16)
    yh = yt.astype(jnp.bfloat16)
    if GRAPH_PRECISION is jax.lax.Precision.DEFAULT:
        return jax.lax.dot_general(xh, yh, **kw)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yl = (yt - yh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(xh, yh, **kw) +
            jax.lax.dot_general(xh, yl, **kw) +
            jax.lax.dot_general(xl, yh, **kw))


def pairwise_sqdist_graph(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """pairwise_sqdist for kNN GRAPH construction (GRAPH_PRECISION).
    x [N, C], y [M, C] -> [N, M]."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1)
    d = x2 + y2[None, :] - 2.0 * graph_dot(x, y.T)
    return jnp.maximum(d, 0.0)


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances between rows of x [N,C] and y [M,C].

    Uses the |x|^2 + |y|^2 - 2<x,y> expansion so the dominant cost is a
    matmul that lands on the MXU.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # [N, 1]
    y2 = jnp.sum(y * y, axis=-1)                          # [M]
    d = x2 + y2[None, :] - 2.0 * jax.lax.dot_general(
        x, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=DISTANCE_PRECISION,
    )
    return jnp.maximum(d, 0.0)
