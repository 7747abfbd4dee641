"""Chamfer distance: golden values vs brute force + gradcheck.

Mirrors the reference gradcheck contract (cuda/chamfer_dist/test.py:22-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from sparenet_tpu.ops import chamfer_raw, chamfer_distance, chamfer_distance_separate


def brute_chamfer(x1, x2):
    d = ((x1[:, :, None, :] - x2[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.min(1), d.argmin(2), d.argmin(1)


def test_chamfer_matches_bruteforce(rng):
    x1 = rng.rand(4, 64, 3).astype(np.float32)
    x2 = rng.rand(4, 128, 3).astype(np.float32)
    d1, d2, i1, i2 = jax.jit(chamfer_raw)(x1, x2)
    bd1, bd2, bi1, bi2 = brute_chamfer(x1, x2)
    np.testing.assert_allclose(d1, bd1, atol=1e-6)
    np.testing.assert_allclose(d2, bd2, atol=1e-6)
    np.testing.assert_array_equal(i1, bi1)
    np.testing.assert_array_equal(i2, bi2)


def test_chamfer_chunked_path(rng):
    # force the chunked lax.map path with a large-ish cloud
    x1 = rng.rand(1, 3000, 3).astype(np.float32)
    x2 = rng.rand(1, 2048, 3).astype(np.float32)
    d1, d2, i1, i2 = jax.jit(chamfer_raw)(x1, x2)
    # verify a sample of rows against direct computation
    sel = np.arange(0, 3000, 97)
    d = ((x1[0, sel, None, :] - x2[0, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d1[0, sel], d.min(-1), atol=1e-5)


def test_chamfer_grad(rng):
    x1 = jnp.asarray(rng.rand(2, 32, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(2, 48, 3), jnp.float32)
    check_grads(chamfer_distance, (x1, x2), order=1, modes=["rev"],
                atol=1e-2, rtol=1e-2)


def test_chamfer_grad_matches_reference_formula(rng):
    """Backward must equal the analytic CUDA formula
    (chamfer_distance.cu:159-204)."""
    x1 = jnp.asarray(rng.rand(2, 16, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(2, 24, 3), jnp.float32)
    d1, d2, i1, i2 = chamfer_raw(x1, x2)

    def loss(a, b):
        r1, r2, _, _ = chamfer_raw(a, b)
        return jnp.sum(r1) + jnp.sum(r2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(x1, x2)

    # reference formulas with unit upstream grads
    e1 = np.zeros_like(x1)
    e2 = np.zeros_like(x2)
    x1n, x2n, i1n, i2n = map(np.asarray, (x1, x2, i1, i2))
    for b in range(2):
        for j in range(16):
            diff = 2 * (x1n[b, j] - x2n[b, i1n[b, j]])
            e1[b, j] += diff
            e2[b, i1n[b, j]] -= diff
        for j in range(24):
            diff = 2 * (x2n[b, j] - x1n[b, i2n[b, j]])
            e2[b, j] += diff
            e1[b, i2n[b, j]] -= diff
    np.testing.assert_allclose(g1, e1, atol=1e-5)
    np.testing.assert_allclose(g2, e2, atol=1e-5)


def test_chamfer_separate(rng):
    x1 = rng.rand(2, 32, 3).astype(np.float32)
    x2 = rng.rand(2, 32, 3).astype(np.float32)
    m1, m2 = chamfer_distance_separate(x1, x2)
    total = chamfer_distance(x1, x2)
    np.testing.assert_allclose(m1 + m2, total, rtol=1e-6)
