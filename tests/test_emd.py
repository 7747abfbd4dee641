"""Auction EMD vs a numpy replica of the CUDA algorithm + sanity checks.

Mirrors the reference self-test (cuda/emd/emd_module.py:98-121): the
returned dist must equal the recomputed squared distance of the returned
assignment, and the approximation must be close to the exact optimal
assignment cost for small problems.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops import emd_auction, emd_loss


def np_auction(x1, x2, eps, iters):
    """Replicates emd_cuda.cu Bid/GetMax/Assign rounds (deterministic
    winner = lowest bidder index within 1e-6 of the max increment)."""
    n = x1.shape[0]
    assignment = np.full(n, -1, np.int64)
    assignment_inv = np.full(n, -1, np.int64)
    price = np.zeros(n)
    for it in range(iters):
        last = it == iters - 1
        unass = assignment < 0
        if not unass.any():
            # CUDA still runs the remaining iters; no state changes happen
            continue
        d = np.sqrt(((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1))
        value = 3.0 - d - price[None, :]
        order = np.argsort(-value, axis=1, kind="stable")
        best_i = order[:, 0]
        best = value[np.arange(n), best_i]
        better = value[np.arange(n), order[:, 1]]
        inc = best - better + eps
        if last:
            assignment[unass] = best_i[unass]
            break
        max_inc = np.full(n, -np.inf)
        for i in np.where(unass)[0]:
            max_inc[best_i[i]] = max(max_inc[best_i[i]], inc[i])
        winner = np.full(n, -1, np.int64)
        for i in np.where(unass)[0]:
            j = best_i[i]
            if inc[i] >= max_inc[j] - 1e-6 and winner[j] < 0:
                winner[j] = i
        for j in np.where(winner >= 0)[0]:
            i = winner[j]
            old = assignment_inv[j]
            if old >= 0:
                assignment[old] = -1
            assignment[i] = j
            assignment_inv[j] = i
            price[j] += inc[i]
    dist = ((x1 - x2[assignment]) ** 2).sum(-1)
    return dist, assignment


def test_emd_matches_numpy_auction(rng):
    x1 = rng.rand(2, 32, 3).astype(np.float32)
    x2 = rng.rand(2, 32, 3).astype(np.float32)
    dist, assign = jax.jit(
        lambda a, b: emd_auction(a, b, 0.02, 20)
    )(x1, x2)
    for b in range(2):
        rd, ra = np_auction(x1[b].astype(np.float64),
                            x2[b].astype(np.float64), 0.02, 20)
        np.testing.assert_array_equal(np.asarray(assign[b]), ra)
        np.testing.assert_allclose(np.asarray(dist[b]), rd, atol=1e-5)


def test_emd_dist_consistent_with_assignment(rng):
    x1 = rng.rand(2, 64, 3).astype(np.float32)
    x2 = rng.rand(2, 64, 3).astype(np.float32)
    dist, assign = emd_auction(x1, x2, 0.005, 50)
    d = ((x1 - np.take_along_axis(x2, np.asarray(assign)[..., None], 1)) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dist), d, atol=1e-6)


def test_emd_near_optimal_small(rng):
    from scipy.optimize import linear_sum_assignment

    x1 = rng.rand(1, 64, 3).astype(np.float32)
    x2 = rng.rand(1, 64, 3).astype(np.float32)
    dist, assign = emd_auction(x1, x2, 0.002, 500)
    approx = np.sqrt(np.asarray(dist)[0]).mean()
    d = np.sqrt(((x1[0, :, None] - x2[0, None]) ** 2).sum(-1))
    r, c = linear_sum_assignment(d)
    exact = d[r, c].mean()
    assert approx <= exact * 1.15 + 1e-3
    # near-bijection (reference prints |set(assignment)|)
    assert len(np.unique(np.asarray(assign)[0])) >= 60


def test_emd_identity(rng):
    x = rng.rand(1, 32, 3).astype(np.float32)
    dist, assign = emd_auction(x, x, 0.001, 200)
    assert float(jnp.sqrt(dist).mean()) < 0.05


def test_emd_grad_formula(rng):
    x1 = jnp.asarray(rng.rand(1, 16, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(1, 16, 3), jnp.float32)
    dist, assign = emd_auction(x1, x2, 0.01, 30)
    g1, g2 = jax.grad(
        lambda a, b: jnp.sum(emd_auction(a, b, 0.01, 30)[0]), argnums=(0, 1)
    )(x1, x2)
    matched = np.take_along_axis(np.asarray(x2), np.asarray(assign)[..., None], 1)
    np.testing.assert_allclose(
        np.asarray(g1), 2.0 * (np.asarray(x1) - matched), atol=1e-5
    )
    # reference: no gradient to xyz2 (emd_cuda.cu:303-316)
    np.testing.assert_array_equal(np.asarray(g2), 0.0)
