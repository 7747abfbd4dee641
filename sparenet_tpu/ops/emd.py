"""Auction-algorithm Earth Mover's Distance (approximate, O(n) memory).

TPU-native equivalent of ``cuda/emd`` (emd_cuda.cu:95-316,
emd_module.py:29-95). Constraints mirror the reference: both clouds the
same size, coords normalized to [0, 1]; n % 1024 == 0 is NOT required here
(the CUDA grid needed it; XLA does not) but is kept as the recommended
shape for tiling efficiency.

Per auction round (emd_cuda.cu Bid/GetMax/Assign):
  1. every unassigned bidder i scores all objects j:
     value = 3 - ||x1_i - x2_j|| - price[j]   (euclidean, not squared)
     and takes the top-2 (best, better); bid target = argmax,
     bid increment = best - better + eps.
  2. per object, the round's max bid increment wins. (The CUDA
     ``max_increments`` buffer never carries usable state across rounds:
     an object that receives any bid is assigned in the same round and
     reset to -1e9, so a fresh per-round max is equivalent.) The CUDA
     GetMax race admits any bidder within 1e-6 of the max; we pick the
     lowest such bidder index deterministically.
  3. winners take ownership; previous owners are unassigned; price[j] +=
     winning increment. On the LAST round every remaining unassigned
     bidder force-assigns to its bid target (Assign with last=true).

Output: (dist [B, n] squared L2 of matched pairs, assignment [B, n]).
Backward (emd_cuda.cu:283-301): gradient flows to xyz1 only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import pairwise_sqdist

__all__ = ["emd_auction", "emd_loss"]

_TILE = 1024


def _round_bids(xyz1, xyz2, price):
    """Top-2 auction values for every bidder. Returns (target [n] int32,
    increment [n]) — valid where the bidder is unassigned (callers mask)."""
    n = xyz1.shape[0]
    tile = min(_TILE, n)
    pad = (-n) % tile
    xp = jnp.pad(xyz1, ((0, pad), (0, 0)))
    tiles = xp.reshape(-1, tile, 3)

    # fold the constant into the per-object row once: v = (3 - price) - d
    # (one fewer full-width pass per tile than 3.0 - d - price)
    pp = 3.0 - price

    def body(tl):
        d = jnp.sqrt(pairwise_sqdist(tl, xyz2))
        v = pp[None, :] - d
        # top-2 via two masked max passes (faster than lax.top_k on TPU;
        # first-occurrence argmax matches the CUDA scan order)
        best_i = jnp.argmax(v, axis=-1)
        best = jnp.take_along_axis(v, best_i[:, None], -1)[:, 0]
        lane2 = jnp.arange(v.shape[-1])
        v2 = jnp.where(lane2[None, :] == best_i[:, None], -jnp.inf, v)
        better = jnp.max(v2, axis=-1)
        return best, better, best_i

    if tiles.shape[0] > 1:
        best, better, best_i = jax.lax.map(body, tiles)
        best = best.reshape(-1)[:n]
        better = better.reshape(-1)[:n]
        best_i = best_i.reshape(-1)[:n]
    else:
        best, better, best_i = body(tiles[0])
    return best_i.astype(jnp.int32), best - better


def _use_pallas_bids(n: int) -> bool:
    from .pallas import emd_pallas as ep
    return (jax.default_backend() not in ("cpu", "gpu")
            and ep.supports(n))


def _resolve_round(n, assignment, assignment_inv, price, target, inc, last):
    """Per-sample post-bid phase of one auction round (GetMax/Assign)."""
    sentinel = jnp.int32(n)
    unass = assignment < 0
    t = jnp.where(unass, target, sentinel)
    # per-object max increment this round (objects with no bids -> -inf)
    max_inc = jnp.full((n + 1,), -jnp.inf, inc.dtype).at[t].max(
        jnp.where(unass, inc, -jnp.inf)
    )
    # deterministic winner: lowest bidder index within 1e-6 of the max
    eligible = unass & (inc >= max_inc[t] - 1e-6)
    winner = jnp.full((n + 1,), sentinel, jnp.int32).at[
        jnp.where(eligible, t, sentinel)
    ].min(jnp.arange(n, dtype=jnp.int32))
    winner = winner[:n]
    has_winner = winner < sentinel

    if last:
        # Assign with last=true (emd_cuda.cu:197-216): every unassigned
        # bidder takes its target; the inverse map / price no longer
        # influence the output.
        a = jnp.where(unass, target, assignment)
        return a, assignment_inv, price

    # unassign previous owners of contested objects
    old = jnp.where(has_winner, assignment_inv, -1)
    a = assignment.at[jnp.where(old >= 0, old, sentinel)].set(-1, mode="drop")
    # assign winners
    obj = jnp.arange(n, dtype=jnp.int32)
    winc = jnp.where(has_winner, inc[jnp.where(has_winner, winner, 0)], 0.0)
    a = a.at[jnp.where(has_winner, winner, sentinel)].set(obj, mode="drop")
    ai = jnp.where(has_winner, winner, assignment_inv)
    pr = price + winc
    return a, ai, pr


def _capacities(n: int):
    """Static capacity ladder for compacted rounds (descending; full
    width first, then quarters while they stay bid-tile-aligned)."""
    caps = [n]
    c = n // 4
    while c >= 256 and c % 256 == 0:
        caps.append(c)
        c //= 4
    return caps


def _compact_resolve(n, u, ids_u, valid, target_c, inc_c, state, last):
    """GetMax/Assign over the COMPACTED bidder list (one sample).

    ids_u [U] ascending global ids of unassigned bidders (n = padding);
    semantics identical to `_resolve_round` restricted to unassigned
    bidders: ascending slots <=> ascending global ids, so lowest-slot
    winners equal the dense path's lowest-global-bidder winners.
    """
    assignment, assignment_inv, price = state
    sentinel = jnp.int32(n)
    t = jnp.where(valid, target_c, sentinel)                  # [U]

    if last:
        a = assignment.at[jnp.where(valid, ids_u, sentinel)].set(
            target_c, mode="drop")
        return a, assignment_inv, price

    slot = jnp.arange(u, dtype=jnp.int32)
    max_inc = jnp.full((n + 1,), -jnp.inf, inc_c.dtype).at[t].max(
        jnp.where(valid, inc_c, -jnp.inf))
    eligible = valid & (inc_c >= max_inc[t] - 1e-6)
    win_slot = jnp.full((n + 1,), u, jnp.int32).at[
        jnp.where(eligible, t, sentinel)].min(slot)
    won = eligible & (win_slot[t] == slot)                    # [U]

    wid = jnp.where(won, ids_u, sentinel)                     # winner ids
    wtgt = jnp.where(won, t, sentinel)                        # their objects
    # unassign previous owners of contested objects, then assign winners
    old = jnp.where(won, assignment_inv[jnp.minimum(wtgt, n - 1)], -1)
    a = assignment.at[jnp.where(old >= 0, old, sentinel)].set(-1, mode="drop")
    a = a.at[wid].set(t, mode="drop")
    ai = assignment_inv.at[wtgt].set(ids_u, mode="drop")
    pr = price.at[wtgt].add(jnp.where(won, inc_c, 0.0), mode="drop")
    return a, ai, pr


def _emd_batched(xyz1, xyz2, eps, iters, return_rounds=False):
    """All-batch auction with adaptive bidder compaction.
    ``return_rounds`` additionally returns the executed auction round
    count (early-exit diagnostics; scripts/r3/emd_final_protocol.py).

    Every round, only the (compacted) unassigned bidders are processed —
    mathematically identical to the dense all-bidders formulation
    (assigned bidders' bids are masked out of GetMax/Assign anyway,
    emd_cuda.cu:95-110 lists unassigned bidders the same way) but the
    per-round cost scales with the unassigned count, which collapses
    after a few rounds. The compacted width is picked per round from a
    static capacity ladder via lax.switch (count <= capacity always, so
    results are bit-identical to the dense path). Bids run through the
    Pallas kernel on TPU, the tiled-XLA top-2 elsewhere.
    """
    b, n, _ = xyz1.shape
    use_pallas = _use_pallas_bids(n)

    if use_pallas:
        from .pallas.emd_pallas import emd_bids_pallas

        def bids(x1c, price):
            return emd_bids_pallas(x1c, xyz2, price)
    else:
        def bids(x1c, price):
            return jax.vmap(
                lambda a, c, p: _round_bids(a, c, p)
            )(x1c, xyz2, price)

    caps = [c for c in _capacities(n)
            if c == n or (not use_pallas) or c % 256 == 0]

    def dense_round(state, last):
        """Full-width round: every bidder bids, assigned ones are masked
        in the resolve — skips the per-round sort + gather entirely (the
        dominant glue cost while the unassigned count stays high)."""
        assignment, assignment_inv, price = state
        target, raw_inc = bids(xyz1, price)
        inc = raw_inc + eps
        a, ai, pr = jax.vmap(
            functools.partial(_resolve_round, n, last=last)
        )(assignment, assignment_inv, price, target, inc)
        return a, ai, pr

    def round_at(u, state, last):
        assignment, assignment_inv, price = state
        unass = assignment < 0
        # compacted unassigned ids, ascending (stable sort on the flag);
        # computed inside the branch so only compacted rounds pay for it
        ids = jnp.argsort(jnp.where(unass, 0, 1).astype(jnp.int32),
                          axis=1, stable=True).astype(jnp.int32)
        ids = jnp.where(jnp.take_along_axis(unass, ids, 1), ids, n)
        ids_u = jax.lax.slice_in_dim(ids, 0, u, axis=1)       # [B, U]
        valid = ids_u < n
        safe = jnp.minimum(ids_u, n - 1)
        x1c = jnp.take_along_axis(xyz1, safe[..., None], 1)   # [B, U, 3]
        target_c, raw_inc = bids(x1c, price)
        inc_c = raw_inc + eps
        a, ai, pr = jax.vmap(
            functools.partial(_compact_resolve, n, u, last=last)
        )(ids_u, valid, target_c, inc_c, state)
        return a, ai, pr

    def round_fn(state, last):
        assignment, _, _ = state
        unass = assignment < 0
        count = jnp.max(jnp.sum(unass.astype(jnp.int32), axis=1))
        # smallest capacity >= count (capacities descending)
        idx = jnp.int32(0)
        for i, c in enumerate(caps[1:], start=1):
            idx = jnp.where(count <= c, jnp.int32(i), idx)
        branches = [functools.partial(dense_round, last=last)] + [
            functools.partial(round_at, c, last=last) for c in caps[1:]]
        return jax.lax.switch(idx, branches, state), None

    state = (
        jnp.full((b, n), -1, jnp.int32),
        jnp.full((b, n), -1, jnp.int32),
        jnp.zeros((b, n), xyz1.dtype),
    )
    rounds = jnp.int32(0)
    if iters > 1:
        # early exit, provably identical to running all iters rounds: a
        # round with zero unassigned bidders is a no-op (every bid is
        # masked out of GetMax/Assign), so stopping once assignment is
        # complete changes nothing — and makes the published final-test
        # protocol (iters=10000, utils/misc.py:209) feasible: the loop
        # runs only until convergence.
        def _cond(carry):
            i, (assignment, _, _) = carry
            return jnp.logical_and(i < iters - 1, jnp.any(assignment < 0))

        def _body(carry):
            i, s = carry
            s, _ = round_fn(s, False)
            return i + 1, s

        rounds, state = jax.lax.while_loop(
            _cond, _body, (jnp.int32(0), state))
    state, _ = round_fn(state, True)
    assignment = state[0]
    matched = jnp.take_along_axis(xyz2, jnp.maximum(assignment, 0)[..., None], 1)
    diff = xyz1 - matched
    dist = jnp.sum(diff * diff, axis=-1)
    if return_rounds:
        return dist, assignment, rounds + 1   # + the final forced round
    return dist, assignment


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                eps: float = 0.005, iters: int = 50):
    """xyz1, xyz2: [B, n, 3] in [0, 1] -> (dist [B, n], assignment [B, n]).

    Parity: emdFunction (emd_module.py:29-88). Validation setting
    eps=0.005, iters=50; final-test setting eps=0.002, iters=10000
    (utils/misc.py:206-211).
    """
    return _emd_batched(xyz1, xyz2, eps, iters)


def _emd_fwd(xyz1, xyz2, eps, iters):
    dist, assignment = emd_auction(xyz1, xyz2, eps, iters)
    return (dist, assignment), (xyz1, xyz2, assignment)


def _emd_bwd(eps, iters, res, cts):
    xyz1, xyz2, assignment = res
    g = cts[0]
    matched = jnp.take_along_axis(xyz2, jnp.maximum(assignment, 0)[..., None], axis=1)
    grad1 = 2.0 * g[..., None] * (xyz1 - matched)
    # reference computes no gradient for xyz2 (emd_cuda.cu:303-316)
    return grad1, jnp.zeros_like(xyz2)


emd_auction.defvjp(_emd_fwd, _emd_bwd)


def emd_loss(pred: jnp.ndarray, gt: jnp.ndarray,
             eps: float = 0.005, iters: int = 50) -> jnp.ndarray:
    """sqrt(dist).mean() — the runners' EMD loss form
    (runners/sparenet_runner.py:92-99)."""
    dist, _ = emd_auction(pred, gt, eps, iters)
    return jnp.mean(jnp.sqrt(dist))
