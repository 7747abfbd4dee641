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


def _round_bids(xyz1, xyz2, price, unassigned):
    """Top-2 auction values for every bidder. Returns (target [n] int32,
    increment [n]) — valid where ``unassigned``."""
    n = xyz1.shape[0]
    tile = min(_TILE, n)
    pad = (-n) % tile
    xp = jnp.pad(xyz1, ((0, pad), (0, 0)))
    tiles = xp.reshape(-1, tile, 3)

    def body(tl):
        d = jnp.sqrt(pairwise_sqdist(tl, xyz2))
        v = 3.0 - d - price[None, :]
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


def _emd_one(xyz1, xyz2, eps, iters):
    n = xyz1.shape[0]
    sentinel = jnp.int32(n)

    def round_fn(state, last):
        assignment, assignment_inv, price = state
        unass = assignment < 0
        target, raw_inc = _round_bids(xyz1, xyz2, price, unass)
        inc = raw_inc + eps

        t = jnp.where(unass, target, sentinel)
        # per-object max increment this round (objects with no bids -> -inf)
        max_inc = jnp.full((n + 1,), -jnp.inf, xyz1.dtype).at[t].max(
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
            return (a, assignment_inv, price), None

        # unassign previous owners of contested objects
        old = jnp.where(has_winner, assignment_inv, -1)
        a = assignment.at[jnp.where(old >= 0, old, sentinel)].set(-1, mode="drop")
        # assign winners
        obj = jnp.arange(n, dtype=jnp.int32)
        winc = jnp.where(has_winner, inc[jnp.where(has_winner, winner, 0)], 0.0)
        a = a.at[jnp.where(has_winner, winner, sentinel)].set(obj, mode="drop")
        ai = jnp.where(has_winner, winner, assignment_inv)
        pr = price + winc
        return (a, ai, pr), None

    state = (
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), xyz1.dtype),
    )
    if iters > 1:
        state, _ = jax.lax.scan(
            lambda s, _: round_fn(s, False), state, None, length=iters - 1
        )
    state, _ = round_fn(state, True)
    assignment = state[0]
    diff = xyz1 - xyz2[jnp.maximum(assignment, 0)]
    dist = jnp.sum(diff * diff, axis=-1)
    return dist, assignment


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                eps: float = 0.005, iters: int = 50):
    """xyz1, xyz2: [B, n, 3] in [0, 1] -> (dist [B, n], assignment [B, n]).

    Parity: emdFunction (emd_module.py:29-88). Validation setting
    eps=0.005, iters=50; final-test setting eps=0.002, iters=10000
    (utils/misc.py:206-211).
    """
    return jax.vmap(lambda a, b: _emd_one(a, b, eps, iters))(xyz1, xyz2)


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
