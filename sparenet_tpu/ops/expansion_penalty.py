"""Expansion penalty: per-primitive minimum-spanning-tree edge penalty.

TPU-native equivalent of ``cuda/expansion_penalty``
(expansion_penalty_cuda.cu:7-149, expansion_penalty_module.py:24-56).

Semantics (per primitive = contiguous block of ``primitive_size`` points):
  1. Prim's MST from local point 0 using *euclidean* (not squared)
     distances (expansion_penalty_cuda.cu:45-57).
  2. mean_dis = (sum of MST edge lengths) / (primitive_size - 1); the
     module's third output averages mean_dis over all primitives
     (module divides the accumulated sum by n/primitive_size,
     expansion_penalty_module.py:40).
  3. Iterative parallel leaf pruning charges each MST edge to the endpoint
     pruned first (ties: both leaves of a final isolated edge -> the
     higher-index endpoint, expansion_penalty_cuda.cu:123-146). Edges
     with length > alpha * mean_dis set dist[charged] = length and
     assignment[charged] = global index of the other endpoint.
  4. Backward (replicated via custom VJP): grad_xyz[u] = 2 * g_u *
     (xyz[u] - xyz[assignment[u]]) for penalized u only — note the
     reference applies the *squared*-distance gradient formula to the
     unsquared distance value (expansion_penalty_cuda.cu:167-198); we
     reproduce that exactly rather than "fixing" it.

TPU mapping: the (batch x n_primitives) axis is vmapped; Prim's runs as a
(primitive_size - 1)-step fori_loop of masked VPU argmin updates; pruning
is a while_loop over parallel leaf-removal rounds on the [S-1] edge list.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["expansion_penalty"]

_BIG = 1e9


def _mst_one(xyz: jnp.ndarray):
    """Prim's MST for one primitive xyz [S, 3].

    Returns (edge_u [S-1], edge_v [S-1], edge_cost [S-1]) where edge i
    connects u (added vertex) to v (its tree neighbor), in insertion order.
    """
    s = xyz.shape[0]

    # carry: visited [S] bool, cur_dis [S], cur_idx [S] int, last int,
    #        edges (u, v, cost) accumulated into fixed arrays
    visited0 = jnp.zeros((s,), bool).at[0].set(True)
    cur_dis0 = jnp.full((s,), _BIG, xyz.dtype)
    cur_idx0 = jnp.zeros((s,), jnp.int32)
    eu0 = jnp.zeros((s - 1,), jnp.int32)
    ev0 = jnp.zeros((s - 1,), jnp.int32)
    ec0 = jnp.zeros((s - 1,), xyz.dtype)

    def body(i, carry):
        visited, cur_dis, cur_idx, last, eu, ev, ec = carry
        d = jnp.sqrt(jnp.sum((xyz - xyz[last]) ** 2, axis=-1))
        closer = (~visited) & (d < cur_dis)
        cur_dis = jnp.where(closer, d, cur_dis)
        cur_idx = jnp.where(closer, last, cur_idx)
        masked = jnp.where(visited, _BIG, cur_dis)
        nxt = jnp.argmin(masked).astype(jnp.int32)
        cost = masked[nxt]
        visited = visited.at[nxt].set(True)
        eu = eu.at[i].set(nxt)
        ev = ev.at[i].set(cur_idx[nxt])
        ec = ec.at[i].set(cost)
        return visited, cur_dis, cur_idx, nxt, eu, ev, ec

    carry = (visited0, cur_dis0, cur_idx0, jnp.int32(0), eu0, ev0, ec0)
    _, _, _, _, eu, ev, ec = jax.lax.fori_loop(0, s - 1, body, carry)
    return eu, ev, ec


def _prune_one(eu, ev, ec, s: int):
    """Parallel leaf pruning of the MST edge list.

    Returns charged [S-1] int32: the endpoint each edge is charged to.
    Round semantics follow expansion_penalty_cuda.cu:123-146: all current
    leaves prune simultaneously; an edge whose both endpoints are leaves
    in the same round is charged to the higher-index endpoint.
    """
    ne = eu.shape[0]

    def degree(alive):
        deg = jnp.zeros((s,), jnp.int32)
        w = alive.astype(jnp.int32)
        deg = deg.at[eu].add(w)
        deg = deg.at[ev].add(w)
        return deg

    def cond(carry):
        alive, charged = carry
        return jnp.any(alive)

    def body(carry):
        alive, charged = carry
        deg = degree(alive)
        u_leaf = alive & (deg[eu] == 1)
        v_leaf = alive & (deg[ev] == 1)
        kill = u_leaf | v_leaf
        both = u_leaf & v_leaf
        chosen = jnp.where(
            both,
            jnp.maximum(eu, ev),
            jnp.where(u_leaf, eu, ev),
        )
        charged = jnp.where(kill, chosen, charged)
        alive = alive & ~kill
        return alive, charged

    alive0 = jnp.ones((ne,), bool)
    charged0 = jnp.zeros((ne,), jnp.int32)
    _, charged = jax.lax.while_loop(cond, body, (alive0, charged0))
    return charged


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def expansion_penalty(xyz: jnp.ndarray, primitive_size: int, alpha: float):
    """xyz [B, N, 3] with N % primitive_size == 0.

    Returns (dist [B, N], assignment [B, N] int32, mean_mst_length [B])
    — module-level outputs of expansionPenaltyFunction
    (expansion_penalty_module.py:26-40): ``dist[u]`` is the length of the
    over-long MST edge charged to u (0 otherwise), ``assignment[u]`` its
    tree neighbor (-1 otherwise), and ``mean_mst_length`` the per-cloud
    average of per-primitive mean edge lengths.
    """
    return _expansion_fwd_impl(xyz, primitive_size, alpha)[0]


def _expansion_fwd_impl(xyz, primitive_size, alpha):
    b, n, _ = xyz.shape
    s = primitive_size
    n_prim = n // s
    prims = xyz.reshape(b * n_prim, s, 3)

    eu, ev, ec = jax.vmap(_mst_one)(prims)                 # [BP, S-1] each
    charged = jax.vmap(lambda u, v, c: _prune_one(u, v, c, s))(eu, ev, ec)

    mean_dis = jnp.sum(ec, axis=-1) / (s - 1)              # [BP]
    over = ec > alpha * mean_dis[:, None]                  # [BP, S-1]

    other = jnp.where(charged == eu, ev, eu)               # [BP, S-1]
    dist = jnp.zeros((b * n_prim, s), xyz.dtype)
    assignment = jnp.full((b * n_prim, s), -1, jnp.int32)
    dist = dist.at[jnp.arange(b * n_prim)[:, None], charged].add(
        jnp.where(over, ec, 0.0)
    )
    assignment = assignment.at[jnp.arange(b * n_prim)[:, None], charged].set(
        jnp.where(over, other, -1), mode="drop"
    )

    # lift local indices to global within-cloud indices
    prim_base = (jnp.arange(b * n_prim, dtype=jnp.int32) % n_prim) * s
    assignment = jnp.where(
        assignment >= 0, assignment + prim_base[:, None], -1
    )

    dist = dist.reshape(b, n)
    assignment = assignment.reshape(b, n)
    mean_mst_length = jnp.mean(mean_dis.reshape(b, n_prim), axis=-1)
    return (dist, assignment, mean_mst_length), (xyz, assignment)


def _expansion_fwd(xyz, primitive_size, alpha):
    out, res = _expansion_fwd_impl(xyz, primitive_size, alpha)
    return out, res


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
