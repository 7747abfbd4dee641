"""MDS quality lab (round 4): find a batched MDS whose SELECTION SET is
greedy-quality at batch-greedy speed.

Round-3 finding (docs/SERVING_ENVELOPE.md): batch-greedy MDS is ~90% of
serving-mode's -16% F-score movement, and shrinking G recovers only
half. Diagnosis (this lab): at production temperature t = 5*mml^2 the
density interaction is LOCAL (a few point-spacings) and densities start
at ~0, so ties dominate early selection; lax.top_k / argmin resolve
ties by INDEX, and the coarse cloud is primitive-grid ordered — so
batch-greedy's round 1 selects "the first G points by index" = whole
primitives, unthinned, while exact greedy sweeps indices SKIPPING
already-bumped neighbors (blue-noise). The quality loss is structural
tie-order bias + missing within-round thinning, not round count.

Candidate fixes measured here against exact greedy (vmapped fori
reference, ops/mds.py:_mds_one), on inputs that mimic the production
layout (32 grid-ordered primitive patches + appended partial crop):

  batched(g)          round-3 baseline relaxation
  batched+perm        static permutation of the tie order (random or
                      stratified van-der-Corput over the primitive
                      grids) before batch-greedy; weights ride the
                      permutation so semantics are preserved
  sieved(g,K)         per-round [G,G] acceptance sieve: candidate i is
                      accepted iff its projected density (v0 + bumps
                      from accepted earlier candidates) stays under the
                      round's tau; K parallel iterations resolve
                      accept-chains
  hybrid(p)           batch-greedy prefix p, exact greedy tail
  (combinations)

Quality metrics (selection-set level, the thing refine consumes):
  excl-J   Jaccard of the EXCLUDED set vs exact (the 15% of points MDS
           rejects is the entire decision at production npoint/N)
  ovl      selected-set overlap
  clump%   fraction of selected points whose NN within the selection is
           < 0.45 * mean spacing (duplicate waste; exact's value is the
           target)
  fill     p99 distance from any cloud point to nearest selected
           (coverage holes)
  F@s      F-score of selection vs an independent ideal sample of the
           same surface at threshold = 1 spacing (downstream proxy)
  CD       gathered-cloud chamfer (squared, reference units) vs exact

Run: JAX_PLATFORMS=cpu python scripts/r4/mds_lab.py  (~2-4 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "repo"))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from sparenet_tpu.ops.chamfer import chamfer_raw
from sparenet_tpu.ops.mds import _mds_one, _mds_batched, _HEAVY_FROM

# ---- lab scale: 1/4 production (N=19384, npoint=16384, mml~0.012) ----
B = 2
N_COARSE = 4096          # 32 prims x 128-pt grid patches (16x8)
N_PART = 750
N = N_COARSE + N_PART
NPOINT = 4096
PRIMS = 32
GH, GW = 16, 8           # per-primitive grid
MML = 0.022              # ~1 mean spacing at this density
HEAVY = _HEAVY_FROM      # 8192: inert at lab scale (matches prod ratio? no —
                         # prod has half the coarse heavy; lab N < 8192 so all
                         # weight-1. Tie-order structure is what we study.)


def make_inputs(seed):
    """32 primitive patches covering a bumpy sphere, each patch sampled
    on a GH x GW grid in row-major order (the decoder's layout), plus an
    appended 'partial' crop re-sampling one hemisphere (duplicates!)."""
    rng = np.random.default_rng(seed)
    clouds = []
    for b in range(B):
        pts = []
        for p in range(PRIMS):
            # patch p covers [u0,u0+du) x [v0,v0+dv) of the (u,v) sphere
            pu, pv = p % 8, p // 8
            u0, du = 2 * np.pi * pu / 8, 2 * np.pi / 8
            v0, dv = -1 + 2 * pv / 4, 2 / 4
            gy, gx = np.meshgrid(np.arange(GH), np.arange(GW), indexing="ij")
            u = u0 + (gx.ravel() + 0.5) / GW * du
            v = v0 + (gy.ravel() + 0.5) / GH * dv
            u = u + rng.normal(0, 0.1 * du / GW, u.shape)
            v = v + rng.normal(0, 0.1 * dv / GH, v.shape)
            v = np.clip(v, -0.999, 0.999)
            r = 0.4 + 0.03 * np.sin(3 * u) * v
            s = np.sqrt(1 - v ** 2)
            pts.append(np.stack([r * s * np.cos(u), r * s * np.sin(u),
                                 r * v], -1))
        coarse = np.concatenate(pts, 0)                    # [4096, 3]
        # partial: jittered re-sample of the z>0 hemisphere (duplicates
        # coarse locally, like a real partial scan overlapping the pred)
        upper = coarse[coarse[:, 2] > 0]
        sel = rng.choice(len(upper), N_PART, replace=True)
        part = upper[sel] + rng.normal(0, 0.004, (N_PART, 3))
        clouds.append(np.concatenate([coarse, part], 0))
    xyz = jnp.asarray(np.stack(clouds), jnp.float32)
    mml = jnp.full((B,), MML, jnp.float32)
    return xyz, mml


def ideal_sample(seed, n=NPOINT):
    """Independent uniform-ish sample of the same surface (F target)."""
    rng = np.random.default_rng(seed + 999)
    out = []
    for b in range(B):
        u = rng.uniform(0, 2 * np.pi, n)
        v = rng.uniform(-1, 1, n)
        r = 0.4 + 0.03 * np.sin(3 * u) * v
        s = np.sqrt(1 - v ** 2)
        out.append(np.stack([r * s * np.cos(u), r * s * np.sin(u), r * v], -1))
    return jnp.asarray(np.stack(out), jnp.float32)


# ---------------- permutations (tie-order fixes) ----------------
def vdc(n):
    """van der Corput (bit-reversal) ranks 0..n-1 (n = 2^k)."""
    bits = int(np.log2(n))
    idx = np.arange(n)
    out = np.zeros(n, np.int64)
    for b in range(bits):
        out = (out << 1) | ((idx >> b) & 1)
    return out


def stratified_perm():
    """Order coarse points so every prefix is a uniform subgrid of every
    primitive: rank = (vdc(grid flat index), primitive round-robin).
    Partial points keep their order, interleaved uniformly after? No —
    appended at the END half-interleaved: give partial ranks spread
    uniformly so a prefix also thins the duplicated region."""
    g = GH * GW
    ranks_grid = vdc(g)                                   # per-patch rank
    order = np.empty(N, np.int64)
    # coarse: sort key = (grid rank, prim) -> round robin over prims
    key_c = ranks_grid[None, :].repeat(PRIMS, 0) * PRIMS + \
        np.arange(PRIMS)[:, None]                          # [prim, g]
    flat_c = key_c.ravel()                                 # index (p, gi)
    # partial: uniform keys spanning the coarse range
    key_p = (np.arange(N_PART) + 0.5) / N_PART * (g * PRIMS)
    keys = np.concatenate([flat_c.astype(np.float64), key_p])
    order = np.argsort(keys, kind="stable").astype(np.int32)
    return order                                           # perm[rank]=orig


def random_perm(seed=0):
    return np.random.default_rng(seed).permutation(N).astype(np.int32)


def apply_perm(fn, perm):
    """Run fn on permuted points, map indices back. Weights ride the
    permutation implicitly ONLY if HEAVY_FROM is inert (lab: N < 8192).
    Production wiring would carry w[perm] explicitly."""
    perm_j = jnp.asarray(perm)

    def run(xyz, npoint, mml):
        px = jnp.take(xyz, perm_j, axis=1)
        idx = fn(px, npoint, mml)
        return jnp.take(perm_j, idx)
    return run


# ---------------- sieved batch-greedy ----------------
def mds_sieved_theta(xyz, npoint, mml, g=512, iters=3, theta=0.5):
    """Thinning sieve decoupled from tau: candidate i is accepted iff
    the density it would GAIN from accepted earlier candidates stays
    under an absolute threshold theta (bump of ~0.85 = a 1-spacing
    near-duplicate of an accepted pick; bump < ~0.3 = far enough that
    greedy order barely cares). Acceptance stays high (only true
    clump-mates are deferred a round), so rounds ~ npoint/(0.7 g)."""
    xyz = jax.lax.stop_gradient(xyz)
    b, n, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    t = (5.0 * mml * mml).astype(jnp.float32)[:, None]
    w = jnp.where(jnp.arange(n) >= HEAVY, 2.0, 1.0).astype(jnp.float32)[None]
    bids = jnp.arange(b)[:, None]
    jj = jnp.arange(g)

    d2_0 = jnp.sum((x - x[:, :1]) ** 2, -1)
    temp = w * jnp.exp(-d2_0 / t)
    temp = temp.at[:, 0].set(1e9)
    out = jnp.zeros((b, npoint), jnp.int32)
    n_sel = jnp.full((b,), 1, jnp.int32)

    def cond(c):
        _, _, n_sel, it = c
        return (it < 4 * npoint // g + 64) & jnp.any(n_sel < npoint)

    def body(c):
        temp, out, n_sel, it = c
        negv, cand = jax.lax.top_k(-temp, g)
        s = jnp.take_along_axis(x, cand[..., None], axis=1)
        cw = jnp.take(w[0], cand)
        d2c = jnp.sum((s[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        bump = cw[:, :, None] * jnp.exp(-d2c / t[..., None])
        lower = (jj[:, None] > jj[None, :]).astype(jnp.float32)

        acc = jnp.ones((b, g), bool)
        for _ in range(iters):
            extra = jnp.einsum("bij,bj->bi", bump * lower[None],
                               acc.astype(jnp.float32))
            acc = extra < theta
            acc = acc.at[:, 0].set(True)
        rem = npoint - n_sel
        csum = jnp.cumsum(acc.astype(jnp.int32), 1)
        acc = acc & (csum <= rem[:, None])
        p_round = jnp.minimum(jnp.sum(acc.astype(jnp.int32), 1), rem)
        pos = n_sel[:, None] + csum - 1
        out = out.at[bids, jnp.where(acc & (pos < npoint), pos, npoint)
                     ].set(cand, mode="drop")
        d2f = jnp.sum((x[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        contrib = jnp.where(acc[:, None, :], jnp.exp(-d2f / t[..., None]), 0.0)
        temp = temp + w * jnp.sum(contrib, 2)
        temp = temp.at[bids, jnp.where(acc, cand, n)].set(1e9, mode="drop")
        return temp, out, n_sel + p_round, it + 1

    _, out, n_sel, rounds = jax.lax.while_loop(
        cond, body, (temp, out, n_sel, jnp.int32(0)))
    return out, n_sel, rounds


def mds_sieved(xyz, npoint, mml, g=512, iters=3, always=8):
    """Multi-round batch-greedy with a [G,G] acceptance sieve.

    Round: top_k(g+1) candidates by density (ascending; ties -> lower
    index = greedy's own tie order). Candidate i is accepted iff
      v0[i] + sum_{j<i accepted} bump[i,j] < tau   (tau = (g+1)-th v)
    evaluated by `iters` parallel passes (acc chains resolve in K~3 at
    local interaction radius). Candidate 0 always accepted (true greedy
    pick) -> guaranteed progress; `always` forces the first `always`
    candidates whose projected density is minimal to be taken if the
    sieve accepts nothing else (stall guard).
    """
    xyz = jax.lax.stop_gradient(xyz)
    b, n, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    t = (5.0 * mml * mml).astype(jnp.float32)[:, None]
    w = jnp.where(jnp.arange(n) >= HEAVY, 2.0, 1.0).astype(jnp.float32)[None]
    bids = jnp.arange(b)[:, None]
    jj = jnp.arange(g)

    d2_0 = jnp.sum((x - x[:, :1]) ** 2, -1)
    temp = w * jnp.exp(-d2_0 / t)
    temp = temp.at[:, 0].set(1e9)
    out = jnp.zeros((b, npoint), jnp.int32)
    n_sel = jnp.full((b,), 1, jnp.int32)

    def cond(c):
        _, _, n_sel, it = c
        return (it < 4 * npoint // g + 64) & jnp.any(n_sel < npoint)

    def body(c):
        temp, out, n_sel, it = c
        negv, cidx = jax.lax.top_k(-temp, g + 1)
        cv = -negv
        tau = cv[:, g]
        cand = cidx[:, :g]
        v0 = cv[:, :g]
        s = jnp.take_along_axis(x, cand[..., None], axis=1)      # [B,G,3]
        cw = jnp.take(w[0], cand)                                 # [B,G]
        d2c = jnp.sum((s[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        bump = cw[:, :, None] * jnp.exp(-d2c / t[..., None])      # i gains
        lower = (jj[:, None] > jj[None, :]).astype(jnp.float32)   # j < i

        acc = jnp.ones((b, g), bool)
        for _ in range(iters):
            extra = jnp.einsum("bij,bj->bi", bump * lower[None],
                               acc.astype(jnp.float32))
            acc = (v0 + extra) < tau[:, None]
            acc = acc.at[:, 0].set(True)
        # cap to remaining
        rem = npoint - n_sel
        csum = jnp.cumsum(acc.astype(jnp.int32), 1)
        acc = acc & (csum <= rem[:, None])
        p_round = jnp.minimum(jnp.sum(acc.astype(jnp.int32), 1), rem)
        # compact accepted to the front (order preserved)
        ordk = jnp.where(acc, csum - 1, g + jj[None])
        # write accepted
        pos = n_sel[:, None] + csum - 1
        out = out.at[bids, jnp.where(acc & (pos < npoint), pos, npoint)
                     ].set(cand, mode="drop")
        # density update with accepted picks only
        d2f = jnp.sum((x[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        contrib = jnp.where(acc[:, None, :], jnp.exp(-d2f / t[..., None]), 0.0)
        temp = temp + w * jnp.sum(contrib, 2)
        temp = temp.at[bids, jnp.where(acc, cand, n)].set(1e9, mode="drop")
        del ordk
        return temp, out, n_sel + p_round, it + 1

    _, out, n_sel, rounds = jax.lax.while_loop(
        cond, body, (temp, out, n_sel, jnp.int32(0)))
    return out, n_sel, rounds


def mds_hybrid(xyz, npoint, mml, prefix_fn, prefix_n):
    """prefix_fn picks prefix_n; exact greedy continues from its density
    state for the tail. Lab implementation: re-run exact greedy seeded
    with the prefix state via _mds_one-style loop on masked densities."""
    b, n, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    t = (5.0 * mml * mml).astype(jnp.float32)
    w = jnp.where(jnp.arange(n) >= HEAVY, 2.0, 1.0).astype(jnp.float32)

    pidx = prefix_fn(xyz, prefix_n, mml)                   # [B, prefix_n]

    def one(xb, pi, tb):
        # rebuild density state after the prefix picks
        s = jnp.take(xb, pi, axis=0)                       # [p,3]
        d2 = jnp.sum((xb[:, None, :] - s[None, :, :]) ** 2, -1)
        temp = w * jnp.sum(jnp.exp(-d2 / tb), 1)
        temp = temp.at[pi].set(1e9)
        idxs = jnp.zeros((npoint,), jnp.int32)
        idxs = jax.lax.dynamic_update_slice(idxs, pi, (0,))

        def body(j, carry):
            temp, idxs, last = carry
            dd = jnp.sum((xb - xb[last]) ** 2, -1)
            temp = temp + w * jnp.exp(-dd / tb)
            nxt = jnp.argmin(temp).astype(jnp.int32)
            temp = temp.at[nxt].set(1e9)
            idxs = idxs.at[j].set(nxt)
            return temp, idxs, nxt

        _, idxs, _ = jax.lax.fori_loop(prefix_n, npoint, body,
                                       (temp, idxs, pi[-1]))
        return idxs
    return jax.vmap(one)(x, pidx, t)


# ---------------- metrics ----------------
def spacing(xyz):
    # mean NN distance of the coarse part
    d = np.asarray(pairwise_nn(xyz[:, :N_COARSE]))
    return float(d.mean())


@jax.jit
def pairwise_nn(a):
    d2 = jnp.sum((a[:, :, None, :] - a[:, None, :, :]) ** 2, -1)
    d2 = d2 + jnp.eye(a.shape[1]) * 1e9
    return jnp.sqrt(jnp.min(d2, -1))


def metrics(tag, xyz, idx, idx_exact, gt, sp, t_ms=None):
    a = np.asarray(idx)
    e = np.asarray(idx_exact)
    n = xyz.shape[1]
    exJ, ovl = [], []
    for r in range(B):
        sa, se = set(a[r].tolist()), set(e[r].tolist())
        xa, xe = set(range(n)) - sa, set(range(n)) - se
        exJ.append(len(xa & xe) / max(len(xa | xe), 1))
        ovl.append(len(sa & se) / NPOINT)
    sel = jnp.take_along_axis(xyz, jnp.asarray(a)[..., None], axis=1)
    nn = np.asarray(pairwise_nn(sel))
    clump = float((nn < 0.45 * sp).mean())
    # fill: p99 of cloud->selected distance
    d1, d2, _, _ = chamfer_raw(xyz, sel)
    fill = float(np.percentile(np.sqrt(np.asarray(d1)), 99))
    # F at 1 spacing vs ideal surface sample
    dg1, dg2, _, _ = chamfer_raw(sel, gt)
    prec = (np.sqrt(np.asarray(dg1)) < sp).mean()
    rec = (np.sqrt(np.asarray(dg2)) < sp).mean()
    f = 2 * prec * rec / max(prec + rec, 1e-9)
    # gathered CD vs exact-gathered
    sel_e = jnp.take_along_axis(xyz, jnp.asarray(e)[..., None], axis=1)
    c1, c2, _, _ = chamfer_raw(sel, sel_e)
    cd = float(jnp.mean(c1) + jnp.mean(c2))
    extra = f"  {t_ms:7.1f} ms" if t_ms is not None else ""
    print(f"{tag:<44s} exclJ {np.mean(exJ):.3f}  ovl {np.mean(ovl):.3f}  "
          f"clump {clump*100:5.2f}%  fill {fill/sp:5.2f}sp  F {f:.4f}  "
          f"CD {cd:.2e}{extra}", flush=True)


def main():
    xyz, mml = make_inputs(0)
    gt = ideal_sample(0)
    sp = spacing(xyz)
    print(f"N={N} npoint={NPOINT} mml={MML} spacing={sp:.4f} "
          f"(mml/spacing={MML/sp:.2f})")

    t0 = time.time()
    exact = jax.jit(jax.vmap(lambda p, m: _mds_one(p, NPOINT, m)))(xyz, mml)
    exact.block_until_ready()
    print(f"exact greedy: {time.time()-t0:.1f}s")
    metrics("exact (self)", xyz, exact, exact, gt, sp)

    for g in (512, 1024):
        idx = jax.jit(lambda x, m, g=g: _mds_batched(x, NPOINT, m, g=g))(
            xyz, mml)
        metrics(f"batched g={g}", xyz, idx, exact, gt, sp)

    for name, perm in (("rand", random_perm()), ("strat", stratified_perm())):
        for g in (1024, 2048):
            fn = apply_perm(
                lambda x, n_, m, g=g: _mds_batched(x, n_, m, g=g), perm)
            idx = jax.jit(lambda x, m: fn(x, NPOINT, m))(xyz, mml)
            metrics(f"batched+perm[{name}] g={g}", xyz, idx, exact, gt, sp)

    for g, K in ((512, 2), (512, 3), (1024, 3)):
        idx, n_sel, rounds = jax.jit(
            lambda x, m, g=g, K=K: mds_sieved(x, NPOINT, m, g=g, iters=K)
        )(xyz, mml)
        done = int(np.asarray(n_sel).min())
        metrics(f"sieved g={g} K={K} (rounds={int(rounds)}, sel={done})",
                xyz, idx, exact, gt, sp)

    for g, K, th in ((1024, 2, 0.25), (1024, 2, 0.5), (1024, 3, 0.5),
                     (2048, 2, 0.5), (2048, 3, 0.5), (2048, 2, 1.0),
                     (2048, 2, 0.25)):
        idx, n_sel, rounds = jax.jit(
            lambda x, m, g=g, K=K, th=th: mds_sieved_theta(
                x, NPOINT, m, g=g, iters=K, theta=th))(xyz, mml)
        done = int(np.asarray(n_sel).min())
        metrics(f"sievT g={g} K={K} th={th} (r={int(rounds)}, s={done})",
                xyz, idx, exact, gt, sp)

    # sieve + stratified perm
    for g, K in ((512, 3), (1024, 3)):
        perm = stratified_perm()
        fn = apply_perm(lambda x, n_, m, g=g, K=K:
                        mds_sieved(x, n_, m, g=g, iters=K)[0], perm)
        idx = jax.jit(lambda x, m: fn(x, NPOINT, m))(xyz, mml)
        metrics(f"sieved+strat g={g} K={K}", xyz, idx, exact, gt, sp)

    # hybrid: batched prefix + exact tail
    for pf in (NPOINT // 2, 3 * NPOINT // 4, 13 * NPOINT // 16,
               7 * NPOINT // 8, 15 * NPOINT // 16):
        idx = jax.jit(lambda x, m, pf=pf: mds_hybrid(
            x, NPOINT, m,
            lambda xx, nn, mm: _mds_batched(xx, nn, mm, g=2048), pf))(
                xyz, mml)
        metrics(f"hybrid batched-prefix={pf} exact-tail", xyz, idx, exact,
                gt, sp)

    # the PRODUCTION hybrid (ops/mds._mds_hybrid, xla tail on CPU)
    from sparenet_tpu.ops.mds import _mds_hybrid
    for g, tail in ((2048, NPOINT // 4), (2048, NPOINT // 8),
                    (2048, NPOINT // 16)):
        idx = jax.jit(lambda x, m, g=g, tail=tail: _mds_hybrid(
            x, NPOINT, m, g=g, tail=tail, tail_impl="xla"))(xyz, mml)
        metrics(f"PROD hybrid g={g} tail={tail}", xyz, idx, exact, gt, sp)

    # hybrid with stratified-permuted batched prefix
    perm = stratified_perm()
    pfn = apply_perm(lambda x, n_, m: _mds_batched(x, n_, m, g=2048), perm)
    for pf in (3 * NPOINT // 4,):
        idx = jax.jit(lambda x, m, pf=pf: mds_hybrid(
            x, NPOINT, m, lambda xx, nn, mm: pfn(xx, nn, mm), pf))(xyz, mml)
        metrics(f"hybrid strat-prefix={pf} exact-tail", xyz, idx, exact,
                gt, sp)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
