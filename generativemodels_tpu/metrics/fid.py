"""Frechet Inception Distance, fully on-device.

Reference parity: generative/metrics/fid.py:21-105 (FIDMetric over
pre-extracted (N, F) feature vectors). The reference delegates the matrix
square root to scipy's LAPACK sqrtm on CPU (:78-81); here the trace of
sqrtm(sigma_x sigma_y) is computed on-device via the symmetric
eigendecomposition of sqrt(sigma_x) sigma_y sqrt(sigma_x), which equals
tr(sqrtm(sigma_x sigma_y)) for PSD covariances — no host round-trip.
"""
from __future__ import annotations

import jax.numpy as jnp


class FIDMetric:
    """FID between two sets of feature vectors with shape (N, F)."""

    def __call__(self, y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return get_fid_score(y_pred, y)


def get_fid_score(y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    if y.ndim > 2 or y_pred.ndim > 2:
        raise ValueError("Inputs should have (number images, number of features) shape.")
    dtype = jnp.float64 if jnp.zeros(1).dtype == jnp.float64 else jnp.float32
    y = jnp.asarray(y, dtype)
    y_pred = jnp.asarray(y_pred, dtype)

    mu_y_pred = jnp.mean(y_pred, axis=0)
    sigma_y_pred = _cov(y_pred)
    mu_y = jnp.mean(y, axis=0)
    sigma_y = _cov(y)
    return compute_frechet_distance(mu_y_pred, sigma_y_pred, mu_y, sigma_y)


def _cov(m: jnp.ndarray) -> jnp.ndarray:
    """Covariance with observations in rows, variables in columns."""
    m = m - jnp.mean(m, axis=0, keepdims=True)
    return m.T @ m / (m.shape[0] - 1)


def _psd_sqrt(a: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    w, v = jnp.linalg.eigh(a)
    w = jnp.clip(w, 0.0, None)
    return (v * jnp.sqrt(w)[None, :]) @ v.T


def _trace_sqrtm_product(sigma_x: jnp.ndarray, sigma_y: jnp.ndarray) -> jnp.ndarray:
    """tr(sqrtm(sigma_x @ sigma_y)) for PSD sigma_x, sigma_y.

    Uses tr(sqrtm(AB)) = tr(sqrtm(sqrt(A) B sqrt(A))) = sum of the square
    roots of the (non-negative) eigenvalues of the symmetrised product.
    """
    sqrt_x = _psd_sqrt(sigma_x)
    m = sqrt_x @ sigma_y @ sqrt_x
    m = (m + m.T) / 2  # clean numerical asymmetry
    w = jnp.linalg.eigvalsh(m)
    return jnp.sum(jnp.sqrt(jnp.clip(w, 0.0, None)))


def compute_frechet_distance(
    mu_x: jnp.ndarray,
    sigma_x: jnp.ndarray,
    mu_y: jnp.ndarray,
    sigma_y: jnp.ndarray,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Frechet distance between two multivariate normals."""
    diff = mu_x - mu_y
    tr_covmean = _trace_sqrtm_product(sigma_x, sigma_y)
    return (
        jnp.dot(diff, diff)
        + jnp.trace(sigma_x)
        + jnp.trace(sigma_y)
        - 2.0 * tr_covmean
    )
