"""Expansion penalty: per-primitive minimum-spanning-tree edge penalty.

TPU-native equivalent of ``cuda/expansion_penalty``
(expansion_penalty_cuda.cu:7-149, expansion_penalty_module.py:24-56).

Semantics (per primitive = contiguous block of ``primitive_size`` points):
  1. Prim's MST from local point 0 using *euclidean* (not squared)
     distances (expansion_penalty_cuda.cu:45-57).
  2. mean_dis = (sum of MST edge lengths) / (primitive_size - 1); the
     module's third output averages mean_dis over all primitives
     (expansion_penalty_module.py:40).
  3. Iterative parallel leaf pruning charges each MST edge to the endpoint
     pruned first (ties: both leaves of a final isolated edge -> the
     higher-index endpoint, expansion_penalty_cuda.cu:123-146). Edges
     with length > alpha * mean_dis set dist[charged] = length and
     assignment[charged] = global index of the other endpoint.
  4. Backward (custom VJP): grad_xyz[u] = 2 * g_u * (xyz[u] -
     xyz[assignment[u]]) for penalized u only — the reference applies the
     *squared*-distance gradient formula to the unsquared distance value
     (expansion_penalty_cuda.cu:167-198); reproduced exactly.

TPU mapping: the MST is encoded as parent pointers (parent[v], cost[v]
for every non-root vertex — exactly the edge list keyed by the vertex
added in Prim's order). On TPU backends a Pallas kernel
(ops/pallas/expansion_pallas.py) computes it with VMEM-resident state;
elsewhere a fori_loop of masked VPU argmin updates. Pruning is a
while_loop over parallel leaf-removal rounds on the edge list.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["expansion_penalty", "mean_mst_length_estimate"]

_BIG = 1e9


def _mst_parents_xla(xyz: jnp.ndarray):
    """Prim's MST for primitives xyz [BP, S, 3] -> (parent [BP, S] int32,
    cost [BP, S]); root (vertex 0) has parent 0 / cost 0."""
    bp, s, _ = xyz.shape

    def one(pts):
        visited0 = jnp.zeros((s,), bool).at[0].set(True)
        cur_dis0 = jnp.full((s,), _BIG, pts.dtype)
        cur_idx0 = jnp.zeros((s,), jnp.int32)
        parent0 = jnp.zeros((s,), jnp.int32)
        cost0 = jnp.zeros((s,), pts.dtype)
        lane = jnp.arange(s)

        def body(i, carry):
            visited, cur_dis, cur_idx, parent, cost, last = carry
            d = jnp.sqrt(jnp.sum((pts - pts[last]) ** 2, axis=-1))
            closer = (~visited) & (d < cur_dis)
            cur_dis = jnp.where(closer, d, cur_dis)
            cur_idx = jnp.where(closer, last, cur_idx)
            masked = jnp.where(visited, _BIG, cur_dis)
            nxt = jnp.argmin(masked).astype(jnp.int32)
            sel = lane == nxt
            visited = visited | sel
            parent = jnp.where(sel, cur_idx, parent)
            cost = jnp.where(sel, masked[nxt], cost)
            return visited, cur_dis, cur_idx, parent, cost, nxt

        carry = (visited0, cur_dis0, cur_idx0, parent0, cost0, jnp.int32(0))
        _, _, _, parent, cost, _ = jax.lax.fori_loop(0, s - 1, body, carry)
        return parent, cost

    return jax.vmap(one)(xyz)


def mst_parents(xyz: jnp.ndarray, primitive_size: int, impl: str = "auto"):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    if impl == "pallas":
        from .pallas.expansion_pallas import mst_parents_pallas
        return mst_parents_pallas(xyz, primitive_size)
    return _mst_parents_xla(xyz)


def _prune_edges(parent: jnp.ndarray, cost: jnp.ndarray, s: int):
    """Parallel leaf pruning on the parent-pointer edge list.

    Edge u (u = 1..S-1) connects u to parent[u]. Returns charged [BP, S-1]
    int32: the endpoint each edge is charged to. Round semantics follow
    expansion_penalty_cuda.cu:123-146.

    TPU design: per round the vertex degrees come from one batched
    matvec against a hoisted one-hot(parent) tensor (MXU work, no
    scatters); the parent-side degree is a take_along_axis gather.
    """
    bp = parent.shape[0]
    eu = jnp.broadcast_to(jnp.arange(1, s, dtype=jnp.int32), (bp, s - 1))
    ev = parent[:, 1:]

    # one-hot child map, hoisted out of the round loop: P[b, e, v] = 1
    # iff parent of edge-vertex e+1 is v.
    p_onehot = jax.nn.one_hot(ev, s, dtype=jnp.bfloat16)     # [BP, S-1, S]

    def cond(carry):
        alive, charged = carry
        return jnp.any(alive)

    def body(carry):
        alive, charged = carry
        aw = alive.astype(jnp.bfloat16)
        # child-edge count per vertex + own-edge contribution
        child = jnp.einsum(
            "be,bev->bv", aw, p_onehot,
            preferred_element_type=jnp.float32)              # [BP, S]
        own = jnp.pad(aw.astype(jnp.float32), ((0, 0), (1, 0)))
        deg = (child + own).astype(jnp.int32)
        u_leaf = alive & (jnp.take_along_axis(deg, eu, 1) == 1)
        v_leaf = alive & (jnp.take_along_axis(deg, ev, 1) == 1)
        kill = u_leaf | v_leaf
        both = u_leaf & v_leaf
        chosen = jnp.where(
            both, jnp.maximum(eu, ev), jnp.where(u_leaf, eu, ev))
        charged = jnp.where(kill, chosen, charged)
        alive = alive & ~kill
        return alive, charged

    alive0 = jnp.ones((bp, s - 1), bool)
    charged0 = jnp.zeros((bp, s - 1), jnp.int32)
    _, charged = jax.lax.while_loop(cond, body, (alive0, charged0))
    return charged


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def expansion_penalty(xyz: jnp.ndarray, primitive_size: int, alpha: float):
    """xyz [B, N, 3] with N % primitive_size == 0.

    Returns (dist [B, N], assignment [B, N] int32, mean_mst_length [B])
    — outputs of expansionPenaltyFunction (expansion_penalty_module.py:26-40).
    """
    return _expansion_fwd_impl(xyz, primitive_size, alpha)[0]


def _expansion_fwd_impl(xyz, primitive_size, alpha, impl: str = "auto"):
    b, n, _ = xyz.shape
    s = primitive_size
    n_prim = n // s
    prims = xyz.reshape(b * n_prim, s, 3)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    if impl == "pallas":
        # fused kernel: MST + tree-DP charge assignment, all VMEM-resident
        from .pallas.expansion_pallas import expansion_pallas
        parent, ec_full, charged_full = expansion_pallas(prims, s)
        ec = ec_full[:, 1:]
        charged = charged_full[:, 1:]
    else:
        parent, ec_full = _mst_parents_xla(prims)           # [BP, S] each
        ec = ec_full[:, 1:]                                 # [BP, S-1]
        charged = _prune_edges(parent, ec_full, s)          # [BP, S-1]

    mean_dis = jnp.sum(ec, axis=-1) / (s - 1)               # [BP]
    over = ec > alpha * mean_dis[:, None]                   # [BP, S-1]

    eu = jnp.broadcast_to(jnp.arange(1, s, dtype=jnp.int32),
                          charged.shape)
    ev = parent[:, 1:]
    other = jnp.where(charged == eu, ev, eu)                # [BP, S-1]
    rows = jnp.arange(b * n_prim)[:, None]
    dist = jnp.zeros((b * n_prim, s), xyz.dtype).at[rows, charged].add(
        jnp.where(over, ec, 0.0))
    assignment = jnp.full((b * n_prim, s), -1, jnp.int32).at[
        rows, charged].max(jnp.where(over, other, -1))

    # lift local indices to global within-cloud indices
    prim_base = (jnp.arange(b * n_prim, dtype=jnp.int32) % n_prim) * s
    assignment = jnp.where(assignment >= 0, assignment + prim_base[:, None], -1)

    dist = dist.reshape(b, n)
    assignment = assignment.reshape(b, n)
    mean_mst_length = jnp.mean(mean_dis.reshape(b, n_prim), axis=-1)
    return (dist, assignment, mean_mst_length), (xyz, assignment)


def _expansion_fwd(xyz, primitive_size, alpha):
    return _expansion_fwd_impl(xyz, primitive_size, alpha)


def _expansion_bwd(primitive_size, alpha, res, cts):
    xyz, assignment = res
    g_dist = cts[0]
    # reference backward (expansion_penalty_cuda.cu:167-198): only the
    # charged endpoint receives gradient, with the squared-distance formula.
    safe_idx = jnp.maximum(assignment, 0)
    neighbor = jnp.take_along_axis(xyz, safe_idx[..., None], axis=1)
    g = jnp.where(assignment >= 0, g_dist * 2.0, 0.0)
    grad_xyz = g[..., None] * (xyz - neighbor)
    return (grad_xyz,)


expansion_penalty.defvjp(_expansion_fwd, _expansion_bwd)


def mean_mst_length_estimate(xyz: jnp.ndarray, primitive_size: int,
                             calibration: float = 3.18) -> jnp.ndarray:
    """Cheap serving-mode estimate of expansion_penalty's third output.

    xyz [B, N, 3] -> mean_mst_length [B]. The refiner only consumes the
    mean MST edge length (as the MDS density temperature t = 5*mml^2,
    MDS_cuda.cu:114-133); the per-edge penalty is a TRAINING loss. This
    estimates mml as calibration * (mean nearest-neighbor distance
    within each primitive) — one [S, S] distance matmul per primitive
    instead of an S-step sequential Prim's loop (0.2 ms vs 6.8 ms at
    B=32, S=512 on v5e; scripts/profile_serving2.py section 3).

    The calibration constant is COARSE-CLOUD-DISTRIBUTION dependent and
    therefore a per-model (and ideally per-checkpoint) knob carried by
    the model classes, not here. Measured ratios (mml/nn_mean):
    random-init SpareNet 3.18 +- 0.11, TRAINED SpareNet 1.326 +- 0.009
    (synthetic-trained flagship; docs/SERVING_ENVELOPE.md), random-init
    MSN 1.91 +- 0.03. Fit yours with scripts/calibrate_mml.py
    [--weights ckpt]. mml enters the MDS temperature quadratically
    (t = 5*mml^2), so a 2.4x miscalibration (3.18 on trained clouds)
    doubles the end-to-end serving drift.
    """
    b, n, _ = xyz.shape
    s = primitive_size
    prims = jax.lax.stop_gradient(xyz).astype(jnp.float32).reshape(
        b * (n // s), s, 3)

    def one(p):
        p2 = jnp.sum(p * p, axis=-1)
        d2 = (p2[:, None] + p2[None, :]
              - 2.0 * jax.lax.dot_general(
                  p, p, (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32))
        d2 = d2 + jnp.eye(s, dtype=d2.dtype) * _BIG
        return jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0)))

    m = jax.vmap(one)(prims).reshape(b, n // s)
    return jnp.mean(m, axis=-1) * jnp.float32(calibration)
