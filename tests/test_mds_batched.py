"""Batch-greedy MDS (ops/mds._mds_batched).

Contract: a RELAXATION of sequential greedy (MDS_cuda.cu:104-211) —
selections within a round do not see each other's density update. At
g=1 the relaxation vanishes and it must reproduce the numpy replica
index-for-index (f64). At g>1 the invariants are: selection 0 is point
0, indices unique and in-range, and the selected SET stays close to
greedy (hardware-measured gathered-cloud CD 4-9e-5 at production shape,
scripts/profile_mds_batched_acc.py — inside the serving-mode envelope).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.mds import _mds_batched, minimum_density_sample
from test_mds_expansion import np_mds


@contextlib.contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def test_batched_g1_is_exact_greedy_f64(rng):
    xyz = rng.rand(2, 193, 3)
    mml = np.array([0.25, 0.4])
    with enable_x64():
        idx = np.asarray(_mds_batched(
            jnp.asarray(xyz, jnp.float64), 120,
            jnp.asarray(mml, jnp.float64), g=1))
    for b in range(2):
        ref = np_mds(xyz[b], 120, float(mml[b]))
        np.testing.assert_array_equal(idx[b], ref, err_msg=f"b={b}")


def test_batched_invariants(rng):
    xyz = jnp.asarray(rng.rand(3, 300, 3), jnp.float32)
    mml = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    for g in (7, 64, 256):
        idx = np.asarray(_mds_batched(xyz, 250, mml, g=g))
        assert idx.shape == (3, 250)
        assert (idx[:, 0] == 0).all()
        assert (idx >= 0).all() and (idx < 300).all()
        for b in range(3):
            assert len(set(idx[b])) == 250, f"g={g} b={b} not unique"


def test_batched_set_close_to_greedy(rng):
    # at small scale the batch relaxation should still overlap greedy
    # heavily (production-scale numbers are hardware-measured)
    xyz = rng.rand(1, 400, 3)
    idx = np.asarray(_mds_batched(
        jnp.asarray(xyz, jnp.float32), 300,
        jnp.asarray([0.15], jnp.float32), g=64))
    ref = np_mds(xyz[0], 300, 0.15)
    overlap = len(set(idx[0]) & set(ref)) / 300
    assert overlap > 0.8, overlap


def test_impl_routing_batched(monkeypatch, rng):
    import sparenet_tpu.ops.mds as mdsmod
    monkeypatch.setattr(mdsmod, "_MDS_IMPL", "batched")
    xyz = jnp.asarray(rng.rand(1, 200, 3), jnp.float32)
    mml = jnp.asarray([0.2], jnp.float32)
    a = np.asarray(minimum_density_sample(xyz, 150, mml))
    b = np.asarray(_mds_batched(xyz, 150, mml, g=mdsmod._MDS_BATCH_G))
    np.testing.assert_array_equal(a, b)


def test_batched_return_xyz_matches_gather(rng):
    xyz = jnp.asarray(rng.rand(2, 300, 3), jnp.float32)
    mml = jnp.asarray([0.1, 0.25], jnp.float32)
    for g in (64, 100, 256):
        idx0 = np.asarray(_mds_batched(xyz, 250, mml, g=g))
        idx, sel = _mds_batched(xyz, 250, mml, g=g, return_xyz=True)
        np.testing.assert_array_equal(np.asarray(idx), idx0)
        want = np.take_along_axis(np.asarray(xyz),
                                  idx0[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(sel), want)


def test_mds_xyz_api_fallback_and_batched(monkeypatch, rng):
    """minimum_density_sample_xyz: the non-batched fallback gathers after
    selection; forcing the batched impl must give (idx, xyz[idx]) too."""
    import sparenet_tpu.ops.mds as mdsmod
    from sparenet_tpu.ops.mds import minimum_density_sample_xyz

    xyz = jnp.asarray(rng.rand(1, 200, 3), jnp.float32)
    mml = jnp.asarray([0.2], jnp.float32)

    idx, sel = minimum_density_sample_xyz(xyz, 150, mml)  # cpu -> xla
    want = np.take_along_axis(np.asarray(xyz),
                              np.asarray(idx)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(sel), want)

    monkeypatch.setattr(mdsmod, "_MDS_IMPL", "batched")
    idx_b, sel_b = minimum_density_sample_xyz(xyz, 150, mml)
    want_b = np.take_along_axis(np.asarray(xyz),
                                np.asarray(idx_b)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(sel_b), want_b)


def test_bisect_select_matches_topk_set(rng):
    """_select_smallest (bisect) AND _select_smallest_sort pick the
    IDENTICAL set stable lax.top_k picks (ties to the lower index) — on
    continuous densities, on pin-heavy rows, and on adversarial tie
    fabrics (many duplicated values, exact-zero underflow lanes). The
    sort arm additionally matches top_k ELEMENTWISE (same ascending
    value order, ties to lower index)."""
    import jax
    import jax.numpy as jnp
    from sparenet_tpu.ops.mds import (_select_smallest,
                                      _select_smallest_sort, _BIG)

    cases = []
    t = rng.rand(4, 300).astype(np.float32) * 100
    cases.append(("continuous", t))
    t2 = t.copy(); t2[:, :40] = _BIG                # pinned block
    cases.append(("pinned", t2))
    t3 = np.repeat(rng.rand(4, 30).astype(np.float32), 10, axis=1)
    cases.append(("dup-fabric", t3))                # 10-way value ties
    t4 = t.copy(); t4[:, 50:200] = 0.0              # underflow lanes
    cases.append(("zeros", t4))
    for take in (1, 7, 150, 299):
        for name, tc in cases:
            tc = jnp.asarray(tc)
            a = np.asarray(jax.jit(
                lambda x: _select_smallest(x, take))(tc))
            b = np.asarray(jax.jit(
                lambda x: jax.lax.top_k(-x, take)[1])(tc))
            for bi in range(tc.shape[0]):
                assert set(a[bi].tolist()) == set(b[bi].tolist()), (
                    name, take, bi)
            # index-sorted within the round, by construction
            assert (np.diff(a, axis=1) > 0).all(), (name, take)
            # sort arm: elementwise-identical to stable top_k
            s = np.asarray(jax.jit(
                lambda x: _select_smallest_sort(x, take))(tc))
            np.testing.assert_array_equal(s, b, err_msg=f"{name} {take}")


def test_batched_bisect_vs_topk_same_selection(rng):
    """End-to-end _mds_batched: the bisect and topk selection arms pick
    identical per-round sets, so the final selection SETS agree at
    every config (order within a round may differ)."""
    import jax.numpy as jnp
    from sparenet_tpu.ops.mds import _mds_batched

    x = jnp.asarray(rng.rand(2, 96, 3), jnp.float32)
    mml = jnp.full((2,), 0.3, jnp.float32)
    for kw in (dict(g=16), dict(g=48), dict(g=8192, schedule=(8, 16))):
        a = np.asarray(_mds_batched(x, 64, mml, select="bisect", **kw))
        b = np.asarray(_mds_batched(x, 64, mml, select="topk", **kw))
        s = np.asarray(_mds_batched(x, 64, mml, select="sort", **kw))
        for bi in range(2):
            assert set(a[bi].tolist()) == set(b[bi].tolist()), kw
            assert set(s[bi].tolist()) == set(b[bi].tolist()), kw

def test_pack16_select_set_properties(rng):
    """pack16 (relaxed 15-bit rank): identical to the exact arms when
    density gaps exceed the 2^-7 rank quantum; on tie fabrics ties
    break to the lower index; indices always unique/in-range; and any
    set difference vs exact on continuous inputs stays confined to the
    near-tie boundary (symmetric difference members' densities differ
    from the exact threshold by < 2^-6 relative)."""
    import jax
    import jax.numpy as jnp
    from sparenet_tpu.ops.mds import (_select_smallest_pack16,
                                      _select_smallest_sort, _BIG)

    # well-separated values: doubling gaps >> 2^-7 -> exact equality
    base = (2.0 ** rng.permutation(np.arange(32))).astype(np.float32)
    t = np.stack([base[rng.permutation(32)] for _ in range(4)])
    for take in (1, 5, 31):
        a = np.asarray(jax.jit(
            lambda x: _select_smallest_pack16(x, take))(jnp.asarray(t)))
        b = np.asarray(jax.jit(
            lambda x: _select_smallest_sort(x, take))(jnp.asarray(t)))
        np.testing.assert_array_equal(np.sort(a, 1), np.sort(b, 1))

    # 10-way exact ties + pinned block: lower-index tie-break, pins out
    t2 = np.repeat(rng.rand(2, 30).astype(np.float32), 10, axis=1)
    t2[:, :40] = _BIG
    a = np.asarray(jax.jit(
        lambda x: _select_smallest_pack16(x, 150))(jnp.asarray(t2)))
    b = np.asarray(jax.jit(
        lambda x: _select_smallest_sort(x, 150))(jnp.asarray(t2)))
    for bi in range(2):
        assert set(a[bi].tolist()) == set(b[bi].tolist())

    # continuous: drift confined to the near-tie boundary
    t3 = jnp.asarray(rng.rand(4, 500).astype(np.float32) * 100)
    take = 300
    a = np.asarray(jax.jit(
        lambda x: _select_smallest_pack16(x, take))(t3))
    b = np.asarray(jax.jit(
        lambda x: _select_smallest_sort(x, take))(t3))
    t3 = np.asarray(t3)
    for bi in range(4):
        sa, sb = set(a[bi].tolist()), set(b[bi].tolist())
        assert len(a[bi]) == len(sa) == take          # unique, full
        thresh = t3[bi][sorted(sb, key=lambda i: t3[bi][i])[-1]]
        for i in sa ^ sb:
            assert abs(t3[bi][i] - thresh) / thresh < 2 ** -6, (bi, i)
