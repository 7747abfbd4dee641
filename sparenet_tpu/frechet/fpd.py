"""Frechet Pointcloud Distance (FPD).

Rebuild of Frechet/FPD.py:26-205: activations from the PointNet
classifier's 1808-d concat layer, Gaussian statistics, and the Frechet
distance with the scipy sqrtm stabilization. The activation forward runs
jitted on device; sqrtm stays on host (scipy), matching the reference's
split (GPU forward, CPU sqrtm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pointnet import PointNetCls


def get_activations(pointclouds, variables, batch_size: int = 100,
                    dims: int = 1808, k: int = 16) -> np.ndarray:
    """pointclouds [M, N, 3] -> activations [M_used, dims]
    (Frechet/FPD.py:26-78; M_used = floor(M / batch_size) * batch_size)."""
    model = PointNetCls(k=k, train=False)

    @jax.jit
    def fwd(pc):
        _, _, actv = model.apply(variables, pc)
        return actv

    m = pointclouds.shape[0]
    n_batches = m // batch_size
    out = np.empty((n_batches * batch_size, dims), np.float64)
    for i in range(n_batches):
        s = i * batch_size
        out[s:s + batch_size] = np.asarray(
            fwd(jnp.asarray(pointclouds[s:s + batch_size], jnp.float32)))
    return out


def calculate_activation_statistics(pointclouds, variables,
                                    batch_size: int = 100, dims: int = 1808):
    """(mu, sigma) of the activation Gaussian (Frechet/FPD.py:134-160)."""
    act = get_activations(pointclouds, variables, batch_size, dims)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Stable Frechet distance (Frechet/FPD.py:80-131)."""
    from scipy.linalg import sqrtm

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                "Imaginary component %s" % np.max(np.abs(covmean.imag)))
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_fpd(pointclouds1, pointclouds2=None, variables=None,
                  statistic_save_path: str | None = None,
                  batch_size: int = 100, dims: int = 1808) -> float:
    """FPD between two cloud sets, or vs precomputed statistics
    (Frechet/FPD.py:178-205).

    `variables` are PointNetCls weights: either converted from the
    reference torch checkpoint (frechet.pointnet.load_torch_state) or a
    natively trained classifier (frechet.train_classifier). The reference
    repo itself ships NO usable checkpoint (.MISSING_LARGE_BLOBS).
    """
    if variables is None:
        raise ValueError(
            "FPD needs classifier weights: pass `variables` "
            "(see sparenet_tpu.frechet.train_classifier / load_torch_state)")
    m1, s1 = calculate_activation_statistics(
        pointclouds1, variables, batch_size, dims)
    if pointclouds2 is not None:
        m2, s2 = calculate_activation_statistics(
            pointclouds2, variables, batch_size, dims)
    else:
        f = np.load(statistic_save_path)
        m2, s2 = f["m"][:], f["s"][:]
        f.close()
    return calculate_frechet_distance(m1, s1, m2, s2)
