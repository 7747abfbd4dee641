"""p2i splatting vs numpy replica + gradcheck (cuda/p2i_op/p2i_test.py:10-36)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from sparenet_tpu.ops import p2i_sum, p2i_max


def np_p2i(points, feats, binds, background, radius, reduce):
    """Replicates p2i_sum/p2i_max forward (p2i_sum.h:7-58, p2i_max.h:7-66)."""
    out = background.copy()
    b, h, w, c = background.shape
    ids = np.full((b, h, w, c), -1, np.int64)
    for pid in range(points.shape[0]):
        py, px = points[pid]
        bi = binds[pid]
        if bi < 0 or bi >= b:
            continue
        for y in range(max(0, int(np.floor(py - radius))),
                       min(h - 1, int(np.ceil(py + radius))) + 1):
            for x in range(max(0, int(np.floor(px - radius))),
                           min(w - 1, int(np.ceil(px + radius))) + 1):
                r = np.sqrt((y - py) ** 2 + (x - px) ** 2)
                if r > radius:
                    continue
                wgt = np.cos(r * np.pi / radius) * 0.5 + 0.5
                for ch in range(c):
                    val = wgt * feats[pid, ch]
                    if reduce == "sum":
                        out[bi, y, x, ch] += val
                    else:
                        if out[bi, y, x, ch] < val:
                            out[bi, y, x, ch] = val
                            ids[bi, y, x, ch] = pid
    return out, ids


def _mk(rng, p=20, b=2, hw=16, c=2):
    points = rng.rand(p, 2).astype(np.float32) * (hw - 1)
    feats = rng.rand(p, c).astype(np.float32)
    binds = rng.randint(0, b, p).astype(np.int32)
    background = np.zeros((b, hw, hw, c), np.float32)
    return points, feats, binds, background


def test_p2i_sum_matches_reference(rng):
    points, feats, binds, bg = _mk(rng)
    out = jax.jit(lambda *a: p2i_sum(*a, 3.0))(points, feats, binds, bg)
    ref, _ = np_p2i(points, feats, binds, bg, 3.0, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_p2i_max_matches_reference(rng):
    points, feats, binds, bg = _mk(rng)
    out = jax.jit(lambda *a: p2i_max(*a, 3.0))(points, feats, binds, bg)
    ref, _ = np_p2i(points, feats, binds, bg, 3.0, "max")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_p2i_sum_grads(rng):
    points, feats, binds, bg = _mk(rng, p=8, b=1, hw=8, c=1)
    tgt = rng.rand(*bg.shape).astype(np.float32)

    def loss(pt, ft, bgx):
        return jnp.sum((p2i_sum(pt, ft, binds, bgx, 2.5) - tgt) ** 2)

    check_grads(loss, (jnp.asarray(points), jnp.asarray(feats),
                       jnp.asarray(bg)), order=1, modes=["rev"],
                atol=0.05, rtol=0.05)


def test_p2i_max_grads(rng):
    points, feats, binds, bg = _mk(rng, p=8, b=1, hw=8, c=1)
    tgt = rng.rand(*bg.shape).astype(np.float32)

    def loss(pt, ft, bgx):
        return jnp.sum((p2i_max(pt, ft, binds, bgx, 2.5) - tgt) ** 2)

    # max-reduce is piecewise-smooth; check at a point where winners are
    # stable under the finite-diff step
    check_grads(loss, (jnp.asarray(points), jnp.asarray(feats),
                       jnp.asarray(bg)), order=1, modes=["rev"],
                atol=0.1, rtol=0.1)


def test_p2i_single_point_smoke(rng):
    """Single point splat (p2i_test.py:10-20): center pixel gets weight 1."""
    points = np.array([[4.0, 4.0]], np.float32)
    feats = np.array([[2.0]], np.float32)
    binds = np.array([0], np.int32)
    bg = np.zeros((1, 9, 9, 1), np.float32)
    out = np.asarray(p2i_sum(points, feats, binds, bg, 2.0))
    np.testing.assert_allclose(out[0, 4, 4, 0], 2.0, atol=1e-6)
    assert out[0, 0, 0, 0] == 0.0
