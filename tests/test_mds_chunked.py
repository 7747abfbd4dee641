"""Validated chunked MDS (ops/mds._mds_chunked) vs the greedy reference.

Under float64 the chunked formulation is exactly greedy (batched-sum
rounding is far below density gaps), so it must reproduce the numpy
replica of MDS_cuda.cu:104-211 index-for-index — including the stable
tie-breaking that duplicates exercise. Under float32 it drifts on
near-ties like every other MDS implementation here (see mds_pallas
docstring); the selected SET stays stable.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

import sparenet_tpu.ops.mds as mdsmod


@contextlib.contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)
from sparenet_tpu.ops.mds import _mds_chunked, minimum_density_sample
from test_mds_expansion import np_mds


def test_chunked_matches_greedy_f64(rng):
    xyz = rng.rand(2, 257, 3)
    mml = np.array([0.25, 0.4])
    with enable_x64():
        xj = jnp.asarray(xyz, jnp.float64)
        mj = jnp.asarray(mml, jnp.float64)
        for chunk in (1, 7, 32, 64):
            idx = np.asarray(_mds_chunked(xj, 180, mj, chunk=chunk))
            for b in range(2):
                ref = np_mds(xyz[b], 180, float(mml[b]))
                np.testing.assert_array_equal(idx[b], ref, err_msg=f"chunk={chunk} b={b}")


def test_chunked_heavy_weighting_f64(rng, monkeypatch):
    monkeypatch.setattr(mdsmod, "_HEAVY_FROM", 48)
    xyz = rng.rand(1, 131, 3)
    with enable_x64():
        idx = np.asarray(_mds_chunked(
            jnp.asarray(xyz, jnp.float64), 100,
            jnp.asarray([0.3], jnp.float64), chunk=16))
    ref = np_mds(xyz[0], 100, 0.3, heavy_from=48)
    np.testing.assert_array_equal(idx[0], ref)


def test_chunked_duplicate_points_tiebreak(rng):
    # exact duplicates force bitwise density ties: both the top_k
    # candidate ordering and the in-chunk validation must break ties by
    # the lowest global index, like argmin does
    base = rng.rand(40, 3)
    xyz = np.concatenate([base, base, base[:20]], axis=0)  # 100 pts
    with enable_x64():
        idx = np.asarray(_mds_chunked(
            jnp.asarray(xyz[None], jnp.float64), 80,
            jnp.asarray([0.3], jnp.float64), chunk=13))
    ref = np_mds(xyz, 80, 0.3)
    np.testing.assert_array_equal(idx[0], ref)


def test_chunked_f32_set_stability(rng):
    xyz = jnp.asarray(rng.rand(2, 600, 3), jnp.float32)
    mml = jnp.asarray([0.2, 0.35], jnp.float32)
    i_ref = np.asarray(minimum_density_sample(xyz, 450, mml, impl="xla"))
    i_chk = np.asarray(minimum_density_sample(xyz, 450, mml, impl="chunked"))
    for b in range(2):
        chk = set(i_chk[b].tolist())
        assert len(chk) == 450            # unique selections
        assert i_chk[b][0] == 0           # selection 0 is point 0
        overlap = len(set(i_ref[b].tolist()) & chk) / 450.0
        assert overlap > 0.97, overlap


def test_chunked_degenerate_cloud_terminates():
    # near-identical points: in-chunk interactions shrink the accepted
    # prefix towards 1 — more rounds, but still valid unique selections
    xyz = (jnp.ones((1, 96, 3), jnp.float32)
           + jnp.linspace(0.0, 1e-6, 96)[None, :, None])
    idx = np.asarray(_mds_chunked(
        xyz, 64, jnp.asarray([1e-3], jnp.float32), chunk=32))[0]
    assert idx[0] == 0
    assert len(set(idx.tolist())) == 64
    assert idx.min() >= 0 and idx.max() < 96
