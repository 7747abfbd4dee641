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

import jax
import jax.numpy as jnp

__all__ = ["minimum_density_sample", "gather_points"]

_BIG = 1e9
_HEAVY_FROM = 8192  # points at index >= this get 2x density weight


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


def minimum_density_sample(xyz: jnp.ndarray, npoint: int,
                           mean_mst_length: jnp.ndarray,
                           impl: str = "auto") -> jnp.ndarray:
    """xyz [B, N, 3], mean_mst_length [B] -> idx [B, npoint] int32.

    Parity: MinimumDensitySampling (MDS_module.py:8-41); non-differentiable.
    On TPU backends the greedy loop runs as a VMEM-resident Pallas kernel
    (ops/pallas/mds_pallas.py); elsewhere as a fori_loop.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    if impl == "pallas":
        from .pallas.mds_pallas import mds_pallas
        return mds_pallas(xyz, npoint, mean_mst_length)
    idx = jax.vmap(lambda p, m: _mds_one(p, npoint, m))(xyz, mean_mst_length)
    return jax.lax.stop_gradient(idx)


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
