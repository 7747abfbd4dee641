"""MDS + expansion penalty vs numpy replicas of the CUDA algorithms."""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops import (
    minimum_density_sample, gather_points, expansion_penalty,
)


def np_mds(xyz, npoint, mml, heavy_from=8192):
    """Replicates minimum_density_sampling_kernel (MDS_cuda.cu:104-211)."""
    n = xyz.shape[0]
    t = 5.0 * mml * mml
    temp = np.zeros(n)
    idxs = np.zeros(npoint, np.int32)
    idxs[0] = 0
    temp[0] = 1e9
    last = 0
    w = np.where(np.arange(n) >= heavy_from, 2.0, 1.0)
    for j in range(1, npoint):
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        temp = temp + w * np.exp(-d / t)
        last = int(np.argmin(temp))
        temp[last] = 1e9
        idxs[j] = last
    return idxs


def test_mds_matches_reference(rng):
    xyz = rng.rand(2, 100, 3).astype(np.float32)
    mml = np.array([0.3, 0.5], np.float32)
    idx = jax.jit(lambda x, m: minimum_density_sample(x, 20, m))(xyz, mml)
    for b in range(2):
        ref = np_mds(xyz[b].astype(np.float64), 20, float(mml[b]))
        np.testing.assert_array_equal(np.asarray(idx[b]), ref)


def test_gather_points_and_grad(rng):
    feats = jnp.asarray(rng.rand(2, 10, 4), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 10, (2, 6)), jnp.int32)
    out = gather_points(feats, idx)
    assert out.shape == (2, 6, 4)
    np.testing.assert_allclose(out[1, 3], feats[1, idx[1, 3]])
    # grad: scatter-add of upstream grads (MDS_cuda.cu:54-79)
    g = jax.grad(lambda f: jnp.sum(gather_points(f, idx) * 2.0))(feats)
    expect = np.zeros((2, 10, 4))
    for b in range(2):
        for j in range(6):
            expect[b, int(idx[b, j])] += 2.0
    np.testing.assert_allclose(np.asarray(g), expect)


def np_mst_penalty(xyz, prim_size, alpha):
    """Replicates calc_penalty (expansion_penalty_cuda.cu:7-149) for one
    cloud, including round-parallel leaf pruning."""
    n = xyz.shape[0]
    n_prim = n // prim_size
    dist = np.zeros(n)
    assignment = np.full(n, -1, np.int64)
    mean_sum = 0.0
    for p in range(n_prim):
        pts = xyz[p * prim_size:(p + 1) * prim_size]
        s = prim_size
        visited = np.zeros(s, bool)
        visited[0] = True
        cur_dis = np.full(s, 1e9)
        cur_idx = np.zeros(s, np.int64)
        last = 0
        edges = []
        for _ in range(s - 1):
            d = np.sqrt(((pts - pts[last]) ** 2).sum(-1))
            upd = (~visited) & (d < cur_dis)
            cur_dis[upd] = d[upd]
            cur_idx[upd] = last
            masked = np.where(visited, 1e9, cur_dis)
            nxt = int(np.argmin(masked))
            edges.append((nxt, int(cur_idx[nxt]), masked[nxt]))
            visited[nxt] = True
            last = nxt
        mean_dis = sum(e[2] for e in edges) / (s - 1)
        mean_sum += mean_dis
        # round-parallel leaf pruning
        alive = np.ones(len(edges), bool)
        charged = np.zeros(len(edges), np.int64)
        while alive.any():
            deg = np.zeros(s, np.int64)
            for i, (u, v, c) in enumerate(edges):
                if alive[i]:
                    deg[u] += 1
                    deg[v] += 1
            for i, (u, v, c) in enumerate(edges):
                if not alive[i]:
                    continue
                ul, vl = deg[u] == 1, deg[v] == 1
                if ul and vl:
                    charged[i] = max(u, v)
                elif ul:
                    charged[i] = u
                elif vl:
                    charged[i] = v
                else:
                    continue
                alive[i] = False
        for i, (u, v, c) in enumerate(edges):
            if c > alpha * mean_dis:
                ch = charged[i]
                other = v if ch == u else u
                dist[p * prim_size + ch] = c
                assignment[p * prim_size + ch] = p * prim_size + other
    return dist, assignment, mean_sum / n_prim


def test_expansion_penalty_matches_reference(rng):
    prim, nprim = 16, 4
    xyz = rng.rand(2, prim * nprim, 3).astype(np.float32)
    d, a, m = jax.jit(
        lambda x: expansion_penalty(x, prim, 1.5)
    )(xyz)
    for b in range(2):
        rd, ra, rm = np_mst_penalty(xyz[b].astype(np.float64), prim, 1.5)
        np.testing.assert_allclose(np.asarray(d[b]), rd, atol=1e-5)
        np.testing.assert_allclose(float(m[b]), rm, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(a[b]), ra)


def test_expansion_penalty_grad_formula(rng):
    prim = 8
    xyz = jnp.asarray(rng.rand(1, 32, 3), jnp.float32)
    d, a, m = expansion_penalty(xyz, prim, 1.2)

    g = jax.grad(lambda x: jnp.sum(expansion_penalty(x, prim, 1.2)[0]))(xyz)
    an, xn = np.asarray(a[0]), np.asarray(xyz[0])
    expect = np.zeros_like(xn)
    for j in range(32):
        if an[j] >= 0:
            # reference applies the squared-distance gradient formula
            # (expansion_penalty_cuda.cu:167-198)
            expect[j] = 2.0 * (xn[j] - xn[an[j]])
    np.testing.assert_allclose(np.asarray(g[0]), expect, atol=1e-5)


def test_mean_mst_length_estimate(rng):
    """Serving-mode mml estimator. Exact contract: the value equals
    calibration * mean per-primitive nearest-neighbor distance (checked
    against a numpy replica). The calibration constant maps NN-mean to
    MST-mean on SpareNet coarse outputs (folded grid patches); the
    ratio is distribution-dependent (uniform random clouds sit ~2.7x
    off), so vs the true MST only an order-of-magnitude bound holds
    here — serving quality is validated on hardware at the real
    distribution (CD drift 6e-6, scripts/profile_serving2.py)."""
    from sparenet_tpu.ops.expansion_penalty import (
        expansion_penalty, mean_mst_length_estimate)

    pts = jnp.asarray(rng.rand(2, 1024, 3), jnp.float32)
    est = mean_mst_length_estimate(pts, 256)
    assert est.shape == (2,)

    p = np.asarray(pts).reshape(8, 256, 3)
    d = np.linalg.norm(p[:, :, None] - p[:, None, :], axis=-1)
    d += np.eye(256) * 1e9
    want = d.min(-1).mean(-1).reshape(2, 4).mean(-1) * 3.18
    np.testing.assert_allclose(np.asarray(est), want, rtol=1e-5)

    _, _, true_mml = expansion_penalty(pts, 256, 1.5)
    ratio = np.asarray(est / true_mml)
    assert np.all(ratio > 0.2) and np.all(ratio < 10.0), ratio


def test_mds_batched_schedule(rng):
    """SPARENET_MDS_SCHEDULE round plan: a schedule that reproduces the
    fixed-G round sequence is bit-identical; a front-loaded schedule
    still yields a valid selection (unique indices, seed pick 0)."""
    import jax.numpy as jnp
    from sparenet_tpu.ops.mds import _mds_batched

    x = jnp.asarray(rng.rand(2, 96, 3), jnp.float32)
    mml = jnp.full((2,), 0.3, jnp.float32)
    npoint = 64

    fixed = _mds_batched(x, npoint, mml, g=16)
    takes_equiv = tuple([16] * 4)            # 1 + 16*3 + final 15
    sched = _mds_batched(x, npoint, mml, g=999, schedule=takes_equiv)
    assert bool(jnp.all(fixed == sched))

    front = _mds_batched(x, npoint, mml, g=8192, schedule=(8, 16))
    out = np.asarray(front)
    assert out.shape == (2, npoint)
    for b in range(2):
        assert out[b, 0] == 0
        assert len(set(out[b].tolist())) == npoint  # no duplicates
