"""Minimum Density Sampling (MDS) and point gathering.

TPU-native equivalent of ``cuda/MDS`` (MDS_cuda.cu:82-211,
MDS_module.py:8-78).

Semantics (minimum_density_sampling_kernel, MDS_cuda.cu:104-211):
  - temp (density) starts at zero; selection 0 is always point 0 and its
    density is set to 1e9.
  - t = 5 * mean_mst_length^2.
  - step j: add exp(-d^2/t) to every point's density, where d is the
    distance to the previously selected point — points with index >= 8192
    get DOUBLE weight (MDS_cuda.cu:130, biasing sampling toward the first
    8192 decoder points over the appended partial cloud) — then select the
    point with minimum density and set its density to 1e9.
  - indices are non-differentiable (MDS_module.py:35).

TPU mapping: a fori_loop of m steps vectorized over the batch; each step
is one VPU pass over the n densities. The density vector lives in VMEM
for the whole loop after XLA fusion.

``gather_points`` / its VJP mirror gather_points_kernel and
gather_points_grad_kernel (MDS_cuda.cu:29-79).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["minimum_density_sample", "gather_points", "resolve_impl"]

_BIG = 1e9
_HEAVY_FROM = 8192  # points at index >= this get 2x density weight

# MDS implementation override: "auto" (Pallas greedy kernel on TPU, XLA
# fori_loop elsewhere), "pallas", "xla", "chunked" (validated chunked
# selection, see _mds_chunked), or "batched" (batch-greedy relaxation,
# see _mds_batched). Chunk size shared by the chunked/batched paths.
_MDS_IMPL = os.environ.get("SPARENET_MDS_IMPL", "auto").lower()
_MDS_CHUNK = int(os.environ.get("SPARENET_MDS_CHUNK", "256"))
if _MDS_CHUNK < 1:
    raise ValueError(f"SPARENET_MDS_CHUNK={_MDS_CHUNK} must be >= 1")
# Batch-greedy round size. Measured on v5e at the production shape
# (B=32, 19384 -> 16384, scripts/profile_serving2.py section 2):
# G=8192 (two rounds, ONE density update) is 13.9 ms vs 23.1 at G=4096
# vs 33.0 at G=1024, with selection quality FLAT-to-better across
# 1024..8192 (gathered-cloud CD 2.45e-5 at 8192, 2.7e-5 below; set
# overlap 0.865 / 0.858). G=npoint-1 (zero updates) collapses quality
# (CD 1.2e-3) — the single update round is what matters.
_MDS_BATCH_G = int(os.environ.get("SPARENET_MDS_BATCH_G", "8192"))
if _MDS_BATCH_G < 1:
    raise ValueError(f"SPARENET_MDS_BATCH_G={_MDS_BATCH_G} must be >= 1")
# Hybrid tail length: the last SPARENET_MDS_TAIL picks run as exact
# greedy continuation on compacted lanes (see _mds_hybrid). The round-4
# lab holds exact-level quality down to npoint/16; default npoint/8 at
# the production shape for margin.
_MDS_TAIL = int(os.environ.get("SPARENET_MDS_TAIL", "2048"))
if _MDS_TAIL < 1:
    raise ValueError(f"SPARENET_MDS_TAIL={_MDS_TAIL} must be >= 1")
# Batch-greedy round-size SCHEDULE (comma ints, e.g. "2048,4096"):
# overrides the fixed G for the leading rounds; the remainder runs in
# one final round. Front-loaded small rounds buy EARLY density updates
# at (nearly) the same total update work as G=8192 — update cost scales
# with npoint minus the final round, so "2048,4096" (final round 10239,
# two updates) costs about one G=8192 update but refreshes the density
# at picks 2048 and 6144 where staleness hurts most. "" = fixed G.
# DEFAULT "2048" (round 5): the staleness damage of batch-greedy MDS
# lives in the EARLY picks, and a single small first round removes it —
# measured quality-NEUTRAL on two independent checkpoints (fine-tuned:
# -2.67% vs fixed G=8192's -4.23%; fresh 8-epoch: +1.22% vs -5.70% —
# docs/SERVING_ENVELOPE.md section 5/7) at ~96% of fixed-G=8192 speed.
# Max-speed dial point: SPARENET_MDS_SCHEDULE= (empty) for fixed
# G=8192.
_MDS_SCHEDULE = tuple(
    int(v) for v in os.environ.get("SPARENET_MDS_SCHEDULE",
                                   "2048").split(",")
    if v.strip())
if any(v < 1 for v in _MDS_SCHEDULE):
    raise ValueError(
        f"SPARENET_MDS_SCHEDULE={_MDS_SCHEDULE} entries must be >= 1")
# Batch-greedy within-round selection: all arms pick the IDENTICAL set
# stable lax.top_k picks (ties to the lower index; set-equality tested
# incl. tie fabrics):
#   "sort"   (default) one stable variadic lax.sort of the f32 density
#            bit patterns with an index payload — the first `take`
#            payload entries ARE stable top_k's picks; flat in `take`,
#            no gathers anywhere.
#   "bisect" take-th-smallest by 31-step binary search on the bit
#            space + cumsum/searchsorted compaction. Also flat in
#            `take`, but the searchsorted scan-method compaction lowers
#            to per-query dynamic gathers on TPU — measured ~98 ms at
#            the production shape (docs/artifacts/r5/stage4), 7x WORSE
#            than the top_k it replaced. Retained as a negative result.
#   "topk"   lax.top_k, whose cost grows steeply with take (2.6 ms at
#            take=2048 -> ~13.6 ms at take=12287 at the production
#            shape, docs/artifacts/r5/stage3) — retained for A/B.
#   "pack16" relaxed 15-bit rank packed with the lane index into ONE
#            i32 sort key (single-key unstable sort; see
#            _select_smallest_pack16) — serving-speed candidate whose
#            selection-set drift lives in the ~2^-7 near-tie envelope;
#            quality must be measured (SERVING_ENVELOPE) per config.
_MDS_SELECT = os.environ.get("SPARENET_MDS_SELECT", "sort").lower()
if _MDS_SELECT not in ("sort", "bisect", "topk", "pack16"):
    raise ValueError(f"SPARENET_MDS_SELECT={_MDS_SELECT!r} "
                     "must be 'sort', 'bisect', 'topk' or 'pack16'")
# What serving-mode "auto" resolves to on TPU ("batched" | "hybrid");
# the stage-1 hardware pass (quality envelope + bench) decides the
# shipped default. SPARENET_MDS_IMPL overrides either way.
_SERVING_IMPL = os.environ.get("SPARENET_MDS_SERVING", "batched").lower()


def resolve_impl(impl: str = "auto") -> str:
    """Resolve an impl request to the concrete implementation
    ``minimum_density_sample`` would run RIGHT NOW (honoring the
    SPARENET_MDS_IMPL override, the backend, and serving mode).

    Public so tooling (bench.py) can label records without reaching
    into module globals; the sampling entry points route through it so
    the label can never drift from the executed path.
    """
    if impl == "auto" and _MDS_IMPL != "auto":
        impl = _MDS_IMPL
    if impl == "auto":
        from .common import FAST_MATH
        if jax.default_backend() in ("cpu", "gpu"):
            impl = "xla"
        elif FAST_MATH:
            impl = _SERVING_IMPL
        else:
            impl = "pallas"
    return impl


def dial_state() -> dict:
    """The batch-greedy dial as a plain dict (public, for tooling /
    bench labeling): round plan (schedule or fixed G) + selection arm."""
    return {
        "rounds": list(_MDS_SCHEDULE) or f"G={_MDS_BATCH_G}",
        "select": _MDS_SELECT,
    }


def _select_smallest(temp: jnp.ndarray, take: int) -> jnp.ndarray:
    """Indices of the `take` smallest densities per batch row — the
    IDENTICAL set stable ``lax.top_k(-temp, take)`` picks (ties resolve
    to the lower index, matching the reference argmin), returned in
    ascending INDEX order instead of ascending value order (the
    batch-greedy consumer is order-free within a round: the selection
    SET drives everything downstream).

    Densities are finite and >= 0 (sums of exp2 terms; pins at 1e9), so
    f32 bit patterns order monotonically as int32 and the take-th
    smallest is found by a 31-step binary search over the bit space —
    31 fused [B, N] count passes, flat in `take` — followed by one
    cumsum + searchsorted compaction. lax.top_k's cost instead grows
    steeply with take (measured 2.6 ms at take=2048 -> ~13.6 ms at
    take=12287, B=32 N=19456; docs/artifacts/r5/stage3/mds_rounds.log),
    which made large-final-round schedules pay more for selection than
    their density updates.
    """
    b, n = temp.shape
    bits = jax.lax.bitcast_convert_type(temp, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi                                        # [B], [B]
        mid = lo + (hi - lo) // 2      # (lo+hi)//2 overflows int32
        cnt = jnp.sum((bits <= mid[:, None]).astype(jnp.int32), axis=1)
        ge = cnt >= take
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((b,), jnp.int32)
    hi0 = jnp.full((b,), jnp.int32(0x4E6E6B28))              # bits(1e9)
    # minimal v with count(bits <= v) >= take  ==  the take-th smallest
    # bit value; 31 iterations cover the full non-negative i32 range
    tau, _ = jax.lax.fori_loop(0, 31, body, (lo0, hi0))
    tau = tau[:, None]
    lt = bits < tau
    need = take - jnp.sum(lt.astype(jnp.int32), axis=1, keepdims=True)
    tie = bits == tau
    rank = jnp.cumsum(tie.astype(jnp.int32), axis=1)         # 1-based
    sel = lt | (tie & (rank <= need))
    csum = jnp.cumsum(sel.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, take + 1, dtype=jnp.int32)
    idx = jax.vmap(lambda cs: jnp.searchsorted(cs, targets, side="left"))(
        csum)
    return idx.astype(jnp.int32)


def _select_smallest_sort(temp: jnp.ndarray, take: int) -> jnp.ndarray:
    """Stable-top_k-identical selection via ONE stable variadic sort.

    Non-negative f32 densities order monotonically as their int32 bit
    patterns; a stable ascending sort with an index payload puts stable
    ``lax.top_k(-temp, take)``'s picks (ties to the lower index) in the
    first `take` payload slots, in ascending VALUE order — the same
    order the topk arm emits. Cost is one [B, N] 32-bit key sort,
    independent of `take` (vs lax.top_k's steep growth in `take`), and
    there are no gathers or scatters anywhere.
    """
    b, n = temp.shape
    bits = jax.lax.bitcast_convert_type(temp, jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    _, idx = jax.lax.sort((bits, iota), dimension=1, num_keys=1,
                          is_stable=True)
    return jax.lax.slice_in_dim(idx, 0, take, axis=1)


def _select_smallest_pack16(temp: jnp.ndarray, take: int) -> jnp.ndarray:
    """Relaxed-rank selection via ONE single-key i32 sort (serving-mode
    candidate, the packed-key kNN relaxation class — knn_pallas.py).

    The sort key packs a 15-bit truncated-f32 rank (sign+exp+6 mantissa
    bits; monotone non-decreasing vs f32 for the non-negative
    densities) with the 15-bit lane index in the low bits: one
    UNIQUE-key unstable sort instead of a 2-operand stable variadic
    sort, and the payload decode is a bitwise-and. Selection can differ
    from the exact arms only where two densities agree to ~2^-7
    relative — the near-tie envelope in which batch-greedy picks are
    interchangeable anyway. Pins (1e9) rank above every reachable
    density sum (< ~2^16), so pinned lanes stay excluded. Quality is a
    measured contract (docs/SERVING_ENVELOPE.md), NOT an identity —
    keep the exact `sort` default anywhere unmeasured.
    """
    b, n = temp.shape
    if n >= (1 << 15):
        return _select_smallest_sort(temp, take)
    bits = jax.lax.bitcast_convert_type(temp, jnp.int32)
    rank = jax.lax.shift_right_logical(bits, 17)          # 15-bit rank
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    key = jnp.bitwise_or(jax.lax.shift_left(rank, 15), iota)
    skey = jax.lax.sort(key, dimension=1, is_stable=False)
    idx = jnp.bitwise_and(skey, (1 << 15) - 1)
    return jax.lax.slice_in_dim(idx, 0, take, axis=1)


def _round_pick(temp: jnp.ndarray, take: int, select: str) -> jnp.ndarray:
    """One batch-greedy round's selection (see _MDS_SELECT)."""
    sel = select or _MDS_SELECT
    if sel == "sort":
        return _select_smallest_sort(temp, take)
    if sel == "bisect":
        return _select_smallest(temp, take)
    if sel == "pack16":
        return _select_smallest_pack16(temp, take)
    return jax.lax.top_k(-temp, take)[1]


def _mds_one(xyz: jnp.ndarray, npoint: int, mean_mst_length: jnp.ndarray) -> jnp.ndarray:
    """One cloud xyz [N, 3] -> idx [npoint] int32."""
    n = xyz.shape[0]
    t = 5.0 * mean_mst_length * mean_mst_length
    weight = jnp.where(jnp.arange(n) >= _HEAVY_FROM, 2.0, 1.0).astype(xyz.dtype)

    temp0 = jnp.zeros((n,), xyz.dtype).at[0].set(_BIG)
    idxs0 = jnp.zeros((npoint,), jnp.int32)

    def body(j, carry):
        temp, idxs, last = carry
        d2 = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        temp = temp + weight * jnp.exp(-d2 / t)
        nxt = jnp.argmin(temp).astype(jnp.int32)
        temp = temp.at[nxt].set(_BIG)
        idxs = idxs.at[j].set(nxt)
        return temp, idxs, nxt

    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (temp0, idxs0, jnp.int32(0)))
    return idxs


@functools.partial(jax.jit, static_argnames=("npoint", "chunk"))
def _mds_chunked(xyz: jnp.ndarray, npoint: int, mean_mst_length: jnp.ndarray,
                 chunk: int = 256) -> jnp.ndarray:
    """Validated chunked MDS: greedy-faithful selection in ~npoint/chunk
    rounds instead of npoint sequential steps.

    The greedy kernel (ops/pallas/mds_pallas.py) is latency-bound: npoint
    sequential N-wide steps at a fixed per-step cost. This formulation
    batches the work:

      round: (1) take the G+1 lowest current densities via lax.top_k
             (stable: ties resolve to the lower index, matching argmin);
             candidates c[0..G-1], threshold tau = (G+1)-th density — a
             lower bound on every non-candidate's density for the whole
             round, since densities only ever increase;
             (2) hypothesize the greedy picks are c[0], c[1], ... in
             order and validate the hypothesis IN PARALLEL: with
             E[i,j] = w(c_i) * exp(-|S_i - S_j|^2 / t) the density of
             candidate i before step p is v0[i] + sum_{j<p} E[i,j]
             (one [G,G] cumsum); step p is valid iff candidate p is the
             (value, global-index)-lexicographic argmin over candidates
             i >= p AND strictly below tau. The accepted prefix p* is
             provably what sequential greedy would have selected
             (non-candidates stay >= tau; boundary ties stop the round
             conservatively and re-rank next round). p* >= 1 always:
             c[0] IS the global lex-argmin by top_k stability.
             (3) apply all p* density updates in ONE fused batched pass
             (sum of exponentials over the accepted chunk), pin the
             accepted candidates, append to the output.

    Exact-greedy semantics up to float associativity (batched sums round
    differently from sequential adds — the same tolerance class as the
    Pallas kernel's exp2 dot form, which shows 99.8% index agreement /
    CD ~1e-11 set stability vs the XLA reference). Degenerate clouds
    only shrink p* (more rounds), never break correctness.

    Parity: MDS_cuda.cu:104-211 semantics (selection 0 = point 0,
    t = 5*mml^2, 2x weight for point index >= 8192, pin to 1e9).
    """
    xyz = jax.lax.stop_gradient(xyz)
    mean_mst_length = jax.lax.stop_gradient(mean_mst_length)
    b, n, _ = xyz.shape
    g = int(min(chunk, max(n - 1, 1)))
    # f32 on device; f64 passes through (for exactness tests under x64)
    dt = xyz.dtype if xyz.dtype == jnp.float64 else jnp.float32
    x = xyz.astype(dt)
    inv_t = (1.0 / (5.0 * mean_mst_length * mean_mst_length)
             ).astype(dt)[:, None]                            # [B,1]
    w = jnp.where(jnp.arange(n) >= _HEAVY_FROM, 2.0, 1.0
                  ).astype(dt)[None]                          # [1,N]
    bids = jnp.arange(b)[:, None]
    jj = jnp.arange(g)

    # selection 0 is point 0: seed its density contribution and pin it
    d2_0 = jnp.sum((x - x[:, :1]) ** 2, -1)                   # [B,N]
    temp = w * jnp.exp(-d2_0 * inv_t)
    temp = temp.at[:, 0].set(_BIG)
    out = jnp.zeros((b, npoint), jnp.int32)                   # out[:,0] = 0
    n_sel = jnp.full((b,), 1, jnp.int32)

    def cond(carry):
        _, _, n_sel, it = carry
        return (it < npoint) & jnp.any(n_sel < npoint)

    def body(carry):
        temp, out, n_sel, it = carry
        negv, cidx = jax.lax.top_k(-temp, g + 1)
        cv = -negv                                            # ascending
        tau = cv[:, g]                                        # [B]
        c = cidx[:, :g]                                       # [B,G]
        v0 = cv[:, :g]
        s = jnp.take_along_axis(x, c[..., None], axis=1)      # [B,G,3]
        sw = jnp.where(c >= _HEAVY_FROM, 2.0, 1.0).astype(jnp.float32)

        # E[b,i,j]: density candidate i gains when candidate j is picked
        d2c = jnp.sum((s[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        e = sw.astype(dt)[:, :, None] * jnp.exp(-d2c * inv_t[..., None])
        pref = jnp.cumsum(e, axis=2)
        pv = v0[:, :, None] + jnp.concatenate(
            [jnp.zeros((b, g, 1), dt), pref[:, :, :-1]], axis=2)

        elig = jj[:, None] >= jj[None, :]                     # i >= p
        vals = jnp.where(elig[None], pv, jnp.inf)
        minv = jnp.min(vals, axis=1)                          # [B,G] per p
        win = jnp.min(jnp.where(vals == minv[:, None, :],
                                c[:, :, None], n), axis=1)    # global-idx tiebreak
        diag = jnp.diagonal(pv, axis1=1, axis2=2)             # [B,G]
        ok = (diag == minv) & (c == win) & (diag < tau[:, None])
        ok = ok.at[:, 0].set(True)   # c[0] is the exact lex-argmin
        p_star = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1),
                         axis=1).astype(jnp.int32)
        p_star = jnp.where(n_sel >= npoint, 0, p_star)        # freeze done rows

        acc = jj[None] < p_star[:, None]                      # [B,G]
        pos = n_sel[:, None] + jj[None]
        out = out.at[bids, jnp.where(acc & (pos < npoint), pos, npoint)
                     ].set(c, mode="drop")

        # one fused batched density update over the accepted chunk
        d2f = jnp.sum((x[:, :, None, :] - s[:, None, :, :]) ** 2, -1)
        contrib = jnp.where(acc[:, None, :],
                            jnp.exp(-d2f * inv_t[..., None]), 0.0)
        temp = temp + w * jnp.sum(contrib, axis=2)
        temp = temp.at[bids, jnp.where(acc, c, n)].set(_BIG, mode="drop")
        return temp, out, n_sel + p_star, it + 1

    _, out, _, _ = jax.lax.while_loop(
        cond, body, (temp, out, n_sel, jnp.int32(0)))
    return jax.lax.stop_gradient(out)


@functools.partial(jax.jit,
                   static_argnames=("npoint", "g", "return_xyz",
                                    "return_state", "schedule", "select"))
def _mds_batched(xyz: jnp.ndarray, npoint: int, mean_mst_length: jnp.ndarray,
                 g: int = 512, return_xyz: bool = False,
                 return_state: bool = False,
                 schedule: tuple = (), select: str = "") -> jnp.ndarray:
    """Batch-greedy MDS: select the G lowest-density points per round and
    apply ONE fused density update, in ceil((npoint-1)/G) rounds.

    This is a relaxation of sequential greedy (MDS_cuda.cu:104-211): the
    G selections within a round do not see each other's density updates.
    Validated chunked selection (_mds_chunked) shows exact greedy cannot
    be batched at production t — the interaction radius of one update
    spans most of the cloud, so the greedy-faithful accepted prefix
    averages ~16-20 regardless of chunk size (scripts/
    profile_mds_chunked.py). Batch-greedy trades trajectory parity for
    ~G-way parallelism; selection-SET drift is what matters downstream
    (the consumer gathers the selected set) and is measured by
    scripts/profile_mds_batched.py.

    Per round: stable lax.top_k (ties to the lower index, matching the
    reference argmin) + a dot-form fused update
      temp += w * exp2(2*kde*<x, s> + bias - kde*|s|^2),
    the same exp2 algebra as the Pallas greedy kernel (mds_pallas.py).
    Selection 0 is point 0; pinned densities 1e9; 2x weight for index
    >= 8192 — all reference semantics preserved (MDS_module.py:8-41).

    With ``return_xyz`` also returns the SELECTED coordinates
    [B, npoint, 3] assembled from the per-round gathers the density
    update performs anyway — the consumer's separate full-width
    gather_points over the base cloud is then mostly index math (the
    serving refine path; only the final round's rows are gathered
    extra).

    With ``return_state`` also returns the final density vector
    [B, N] f32 with EVERY pick's bump applied and picked lanes pinned
    to 1e9 (the hybrid schedule's tail, _mds_hybrid, continues exact
    greedy from this state; the plain path skips the last round's
    update/pins since nothing consumes them).
    """
    xyz = jax.lax.stop_gradient(xyz)
    mean_mst_length = jax.lax.stop_gradient(mean_mst_length)
    b, n, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    l2e = jnp.float32(1.4426950408889634)
    kde = (l2e / (5.0 * mean_mst_length * mean_mst_length)
           ).astype(jnp.float32)[:, None]                     # [B,1]
    lane = jnp.arange(n)[None, :]
    logw = jnp.where(lane >= _HEAVY_FROM, 1.0, 0.0).astype(jnp.float32)
    px2 = jnp.sum(x * x, axis=-1)                             # [B,N]
    bias = logw - px2 * kde                                   # [B,N]
    bids = jnp.arange(b)[:, None]

    # round 0 seeds from selection 0 (= point 0)
    s0 = x[:, :1]                                             # [B,1,3]
    arg0 = (jnp.einsum("bnd,bgd->bng", x, 2.0 * kde[..., None] * s0)
            + bias[..., None]
            - (jnp.sum(s0 * s0, -1) * kde)[:, None, :])
    temp = jnp.sum(jnp.exp2(arg0), axis=2)
    temp = temp.at[:, 0].set(_BIG)
    out = jnp.zeros((b, npoint), jnp.int32)                   # out[:,0] = 0
    out_xyz = None
    if return_xyz:
        out_xyz = jnp.zeros((b, npoint, 3), xyz.dtype)
        out_xyz = jax.lax.dynamic_update_slice(
            out_xyz, xyz[:, :1], (0, 0, 0))

    # round sizes: a fixed G, or an explicit schedule (front-loaded
    # small rounds buy EARLY density updates at the same total update
    # work — update cost scales with the number of selections COVERED
    # by updates, i.e. npoint minus the final round's size, so e.g.
    # [2048, 4096, 10240] costs the same as G=8192 but refreshes the
    # density twice instead of once). Python-static: shapes per round
    # are compile-time constants either way.
    takes, covered = [], 1
    for r in (schedule or ()):
        if covered >= npoint:
            break
        t = min(int(r), npoint - covered)
        takes.append(t)
        covered += t
    while covered < npoint:
        t = min(g, npoint - covered)
        takes.append(t)
        covered += t

    done, pos = 1, 1
    for take in takes:
        c = _round_pick(temp, take, select)    # stable-top_k set
        last = done + take >= npoint
        update = (not last) or return_state
        out = jax.lax.dynamic_update_slice(out, c, (0, pos))
        if update:
            s = jnp.take_along_axis(x, c[..., None], axis=1)  # [B,take,3]
        if return_xyz:
            # gather the RETURNED rows from the original xyz (not the
            # internal f32 cast x), so sel == xyz[idx] exactly for any
            # input dtype; for f32 inputs XLA CSEs the two gathers.
            out_xyz = jax.lax.dynamic_update_slice(
                out_xyz, jnp.take_along_axis(xyz, c[..., None], axis=1),
                (0, pos, 0))
        if update:
            arg = (jnp.einsum("bnd,bgd->bng", x, 2.0 * kde[..., None] * s)
                   + bias[..., None]
                   - (jnp.sum(s * s, -1) * kde)[:, None, :])
            temp = temp + jnp.sum(jnp.exp2(arg), axis=2)
            temp = temp.at[bids, c].set(_BIG)
        done += take
        pos += take
    outs = (jax.lax.stop_gradient(out),)
    if return_xyz:
        outs = outs + (jax.lax.stop_gradient(out_xyz),)
    if return_state:
        outs = outs + (jax.lax.stop_gradient(temp),)
    return outs if len(outs) > 1 else outs[0]


@functools.partial(jax.jit, static_argnames=("npoint", "g", "tail",
                                              "tail_impl", "return_xyz"))
def _mds_hybrid(xyz: jnp.ndarray, npoint: int, mean_mst_length: jnp.ndarray,
                g: int = 8192, tail: int = 2048,
                tail_impl: str = "auto",
                return_xyz: bool = False) -> jnp.ndarray:
    """Hybrid batched-prefix / exact-greedy-tail MDS (the round-4
    quality-neutral serving path; VERDICT r3 task #1).

    Round-3 attribution showed batch-greedy MDS carries ~90% of
    serving-mode's metric movement, and the round-4 lab
    (scripts/r4/mds_lab.py) isolates WHERE: the damage is concentrated
    in the LAST batched round — the final ~15% of picks determine the
    excluded set (npoint/N = 0.85), and picking them by stale density
    leaves coverage holes (fill p99 1.7-1.9 vs 1.18 spacings) and
    near-duplicate clumps. A batched prefix followed by an EXACT greedy
    tail holds exact-level quality down to tails of npoint/16 (lab
    F-proxy 0.754 vs exact 0.753; clump/fill at or better than exact),
    because the prefix hands the tail a fully-correct density state.

    Speed: the prefix is the existing batch-greedy (~G-way parallel);
    the tail runs the exact Pallas kernel (mds_pallas_continue) on
    COMPACTED live lanes — width N - (npoint - tail) ~ 5-6k instead of
    19k, so the tail's sequential steps are ~3-4x cheaper than the same
    steps of a full exact run.

    Semantics: prefix picks follow _mds_batched (reference argmin
    tie-order within top_k); tail picks are exact greedy continuation
    (MDS_cuda.cu:104-211) from the prefix state. Non-differentiable.
    """
    xyz = jax.lax.stop_gradient(xyz)
    mean_mst_length = jax.lax.stop_gradient(mean_mst_length)
    b, n, _ = xyz.shape
    tail = int(min(tail, npoint - 1))
    npick = npoint - tail
    if tail <= 0:
        return _mds_batched(xyz, npoint, mean_mst_length, g=g,
                            return_xyz=return_xyz)

    if return_xyz:
        out_pref, xyz_pref, temp = _mds_batched(
            xyz, npick, mean_mst_length, g=g, return_xyz=True,
            return_state=True)
    else:
        out_pref, temp = _mds_batched(xyz, npick, mean_mst_length, g=g,
                                      return_state=True)

    if tail_impl == "auto":
        tail_impl = ("xla" if jax.default_backend() in ("cpu", "gpu")
                     else "pallas")

    if tail_impl == "xla":
        # full-width continuation (CPU/tests): argmin-first greedy —
        # the prefix state already includes every prefix bump
        x = xyz.astype(jnp.float32)
        t = (5.0 * mean_mst_length * mean_mst_length).astype(jnp.float32)
        w = jnp.where(jnp.arange(n) >= _HEAVY_FROM, 2.0, 1.0
                      ).astype(jnp.float32)

        def one(xb, tb, temp_b):
            idxs0 = jnp.zeros((tail,), jnp.int32)

            def body(j, carry):
                temp, idxs = carry
                nxt = jnp.argmin(temp).astype(jnp.int32)
                temp = temp.at[nxt].set(_BIG)
                d2 = jnp.sum((xb - xb[nxt]) ** 2, axis=-1)
                temp = temp + w * jnp.exp(-d2 / tb)
                idxs = idxs.at[j].set(nxt)
                return temp, idxs

            _, idxs = jax.lax.fori_loop(0, tail, body, (temp_b, idxs0))
            return idxs

        out_tail = jax.vmap(one)(x, t, temp)
    else:
        # compact picked lanes out (stable sort on a picked flag: live
        # lanes keep their relative order, so argmin tie-breaking in the
        # tail matches the original index order)
        from .pallas.mds_pallas import mds_pallas_continue

        nlive = n - npick
        lane = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                                (b, n))
        picked = temp >= _BIG / 2
        key = jnp.where(picked, jnp.int32(1 << 24), 0) + lane
        xt = jnp.moveaxis(xyz.astype(jnp.float32), -1, 0)
        _, temp_c, orig, xs, ys, zs = jax.lax.sort(
            (key, temp, lane, xt[0], xt[1], xt[2]),
            dimension=-1, num_keys=1)
        temp_c = temp_c[:, :nlive]
        orig = orig[:, :nlive]
        xyz_c = jnp.stack([xs[:, :nlive], ys[:, :nlive], zs[:, :nlive]],
                          axis=-1)
        lanes = mds_pallas_continue(xyz_c, temp_c, orig, mean_mst_length,
                                    tail)
        out_tail = jnp.take_along_axis(orig, lanes, axis=1)

    out = jnp.concatenate([out_pref, out_tail], axis=1)
    if return_xyz:
        # tail rows are a narrow [B, tail] gather; the prefix rows ride
        # the gathers the batched rounds performed anyway
        xyz_tail = jnp.take_along_axis(xyz, out_tail[..., None], axis=1)
        sel = jnp.concatenate([xyz_pref, xyz_tail], axis=1)
        return jax.lax.stop_gradient(out), jax.lax.stop_gradient(sel)
    return jax.lax.stop_gradient(out)


def minimum_density_sample(xyz: jnp.ndarray, npoint: int,
                           mean_mst_length: jnp.ndarray,
                           impl: str = "auto") -> jnp.ndarray:
    """xyz [B, N, 3], mean_mst_length [B] -> idx [B, npoint] int32.

    Parity: MinimumDensitySampling (MDS_module.py:8-41); non-differentiable.
    On TPU backends the greedy loop runs as a VMEM-resident Pallas kernel
    (ops/pallas/mds_pallas.py); elsewhere as a fori_loop. The validated
    chunked formulation (_mds_chunked) is selectable via impl="chunked"
    or SPARENET_MDS_IMPL=chunked.
    """
    # serving mode resolves "auto" to _SERVING_IMPL ("batched" |
    # "hybrid"): batch-greedy is ~2.7x the exact greedy kernel (30 vs
    # 80 ms at the production shape) with selection-set drift 4-9e-5
    # gathered-cloud CD; the r4 hybrid adds an exact greedy tail on
    # compacted lanes for greedy-level quality (scripts/r4/mds_lab.py).
    # Parity mode keeps exact greedy.
    impl = resolve_impl(impl)
    if impl == "chunked":
        return _mds_chunked(xyz, npoint, mean_mst_length, chunk=_MDS_CHUNK)
    if impl == "batched":
        return _mds_batched(xyz, npoint, mean_mst_length, g=_MDS_BATCH_G,
                            schedule=_MDS_SCHEDULE, select=_MDS_SELECT)
    if impl == "hybrid":
        return _mds_hybrid(xyz, npoint, mean_mst_length, g=_MDS_BATCH_G,
                           tail=_MDS_TAIL)
    if impl == "pallas":
        from .pallas.mds_pallas import mds_pallas
        return mds_pallas(xyz, npoint, mean_mst_length)
    idx = jax.vmap(lambda p, m: _mds_one(p, npoint, m))(xyz, mean_mst_length)
    return jax.lax.stop_gradient(idx)


def minimum_density_sample_xyz(xyz: jnp.ndarray, npoint: int,
                               mean_mst_length: jnp.ndarray,
                               impl: str = "auto"):
    """Like minimum_density_sample, but also returns the SELECTED
    coordinates xyz[idx] [B, npoint, 3] (both stop-gradiented).

    The batched impl assembles them from the per-round gathers its
    density update performs anyway, so the consumer saves a full-width
    gather over the base cloud (~75%% of the rows at G=4096); other
    impls gather once after selection.
    """
    impl = resolve_impl(impl)
    if impl == "batched":
        return _mds_batched(xyz, npoint, mean_mst_length, g=_MDS_BATCH_G,
                            return_xyz=True, schedule=_MDS_SCHEDULE,
                            select=_MDS_SELECT)
    if impl == "hybrid":
        return _mds_hybrid(xyz, npoint, mean_mst_length, g=_MDS_BATCH_G,
                           tail=_MDS_TAIL, return_xyz=True)
    idx = minimum_density_sample(xyz, npoint, mean_mst_length, impl=impl)
    sel = jnp.take_along_axis(jax.lax.stop_gradient(xyz),
                              idx[..., None], axis=1)
    return idx, sel


@jax.custom_vjp
def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, N, C], idx [B, M] -> [B, M, C].

    Parity: GatherOperation (MDS_module.py:44-78) — the reference is
    channel-first [B, C, N]; this is the channel-last analog.
    """
    return jnp.take_along_axis(features, idx[..., None], axis=1)


def _gather_fwd(features, idx):
    return gather_points(features, idx), (features.shape, idx)


def _gather_bwd(res, g):
    shape, idx = res
    grad = jnp.zeros(shape, g.dtype).at[
        jnp.arange(shape[0])[:, None], idx
    ].add(g)
    return grad, None


gather_points.defvjp(_gather_fwd, _gather_bwd)
