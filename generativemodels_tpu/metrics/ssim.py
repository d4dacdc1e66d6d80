"""SSIM and MS-SSIM metrics, fully on-device.

Reference parity: generative/metrics/ssim.py:28-231 (SSIMMetric,
compute_ssim_and_cs with separable gaussian/uniform kernels and grouped
depthwise convs) and generative/metrics/ms_ssim.py:29-153
(MultiScaleSSIMMetric with the Wang 5-scale weights, avg-pool pyramid and
prod(cs_i^w_i) * ssim^w_last). Golden values from the reference tests are
reproduced to 1e-6 (tests/test_metrics.py).
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from jax import lax


def _ensure_tuple(v, n: int) -> tuple:
    if isinstance(v, Sequence) and not isinstance(v, str):
        return tuple(v)
    return (v,) * n


def _gaussian_kernel(
    spatial_dims: int, kernel_size: Sequence[int], kernel_sigma: Sequence[float]
) -> jnp.ndarray:
    """Separable gaussian kernel of shape (*kernel_size,)."""

    def gaussian_1d(size: int, sigma: float) -> np.ndarray:
        dist = np.arange((1 - size) / 2, (1 + size) / 2, 1, dtype=np.float32)
        gauss = np.exp(-((dist / sigma) ** 2) / 2)
        return gauss / gauss.sum()

    kernel = gaussian_1d(kernel_size[0], kernel_sigma[0])[:, None] @ gaussian_1d(
        kernel_size[1], kernel_sigma[1]
    )[None, :]
    if spatial_dims == 3:
        kz = gaussian_1d(kernel_size[2], kernel_sigma[2])
        kernel = kernel[..., None] * kz[None, None, :]
    return jnp.asarray(kernel)


def _depthwise_valid_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv of (B, C, *spatial) with a (*k,) kernel."""
    n = x.ndim - 2
    c = x.shape[1]
    # kernel -> (*k, 1, C) for channels-last depthwise
    k = jnp.broadcast_to(kernel[..., None, None], kernel.shape + (1, c))
    perm = (0,) + tuple(range(2, 2 + n)) + (1,)
    inv_perm = (0, n + 1) + tuple(range(1, n + 1))
    xc = jnp.transpose(x, perm)
    sp = "DHW"[-n:]
    dn = lax.conv_dimension_numbers(xc.shape, k.shape, (f"N{sp}C", f"{sp}IO", f"N{sp}C"))
    out = lax.conv_general_dilated(
        xc, k, (1,) * n, "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return jnp.transpose(out, inv_perm)


def compute_ssim_and_cs(
    y_pred: jnp.ndarray,
    y: jnp.ndarray,
    spatial_dims: int,
    data_range: float = 1.0,
    kernel_type: str = "gaussian",
    kernel_size: Sequence[int] | int = 11,
    kernel_sigma: Sequence[float] | float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image SSIM map and contrast sensitivity for (B, C, *spatial)."""
    if y.shape != y_pred.shape:
        raise ValueError(
            f"y_pred and y should have same shapes, got {y_pred.shape} and {y.shape}."
        )
    kernel_size = _ensure_tuple(kernel_size, spatial_dims)
    kernel_sigma = _ensure_tuple(kernel_sigma, spatial_dims)

    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if kernel_type == "gaussian":
        kernel = _gaussian_kernel(spatial_dims, kernel_size, kernel_sigma)
    elif kernel_type == "uniform":
        kernel = jnp.ones(kernel_size, jnp.float32) / float(np.prod(kernel_size))
    else:
        raise ValueError(f"kernel_type must be 'gaussian' or 'uniform', got {kernel_type}")

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _depthwise_valid_conv(y_pred, kernel)
    mu_y = _depthwise_valid_conv(y, kernel)
    mu_xx = _depthwise_valid_conv(y_pred * y_pred, kernel)
    mu_yy = _depthwise_valid_conv(y * y, kernel)
    mu_xy = _depthwise_valid_conv(y_pred * y, kernel)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    contrast_sensitivity = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * contrast_sensitivity
    return ssim, contrast_sensitivity


class SSIMMetric:
    """Structural Similarity Index per batch element (mean over the SSIM map)."""

    def __init__(
        self,
        spatial_dims: int,
        data_range: float = 1.0,
        kernel_type: str = "gaussian",
        kernel_size: Sequence[int] | int = 11,
        kernel_sigma: Sequence[float] | float = 1.5,
        k1: float = 0.01,
        k2: float = 0.03,
        reduction: str = "mean",
        get_not_nans: bool = False,
    ) -> None:
        self.spatial_dims = spatial_dims
        self.data_range = data_range
        self.kernel_type = kernel_type
        self.kernel_size = _ensure_tuple(kernel_size, spatial_dims)
        self.kernel_sigma = _ensure_tuple(kernel_sigma, spatial_dims)
        self.k1 = k1
        self.k2 = k2
        self.reduction = reduction
        self.get_not_nans = get_not_nans

    def _reduce(self, per_batch: jnp.ndarray):
        """Apply `reduction`; with get_not_nans=True (reference:
        generative/metrics/ssim.py:54 via MONAI RegressionMetric), NaN
        entries are excluded and `(value, not_nans_count)` is returned."""
        if self.get_not_nans:
            finite = jnp.isfinite(per_batch)
            not_nans = jnp.sum(finite).astype(jnp.float32)
            safe = jnp.where(finite, per_batch, 0.0)
            if self.reduction == "mean":
                return safe.sum() / jnp.maximum(not_nans, 1.0), not_nans
            if self.reduction == "sum":
                return safe.sum(), not_nans
            return per_batch, not_nans
        if self.reduction == "mean":
            return per_batch.mean()
        if self.reduction == "sum":
            return per_batch.sum()
        return per_batch

    def _validate(self, y_pred):
        expected = self.spatial_dims + 2
        if y_pred.ndim != expected:
            raise ValueError(
                f"y_pred should have {expected} dimensions when using "
                f"{self.spatial_dims} spatial dimensions, got {y_pred.ndim}."
            )

    def __call__(self, y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        self._validate(y_pred)
        ssim, _ = compute_ssim_and_cs(
            y_pred, y, self.spatial_dims, self.data_range, self.kernel_type,
            self.kernel_size, self.kernel_sigma, self.k1, self.k2,
        )
        per_batch = ssim.reshape(ssim.shape[0], -1).mean(axis=1, keepdims=True)
        return self._reduce(per_batch)


class MultiScaleSSIMMetric(SSIMMetric):
    """MS-SSIM over an avg-pool pyramid with per-scale CS weighting."""

    def __init__(
        self,
        spatial_dims: int,
        data_range: float = 1.0,
        kernel_type: str = "gaussian",
        kernel_size: Sequence[int] | int = 11,
        kernel_sigma: Sequence[float] | float = 1.5,
        k1: float = 0.01,
        k2: float = 0.03,
        weights: Sequence[float] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
        reduction: str = "mean",
        get_not_nans: bool = False,
    ) -> None:
        super().__init__(
            spatial_dims, data_range, kernel_type, kernel_size, kernel_sigma, k1, k2,
            reduction, get_not_nans,
        )
        self.weights = tuple(weights)

    def _avg_pool(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.spatial_dims
        dims = (1, 1) + (2,) * n
        summed = lax.reduce_window(x, 0.0, lax.add, dims, dims, "VALID")
        return summed / float(2**n)

    def __call__(self, y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        self._validate(y_pred)
        weights_div = max(1, len(self.weights) - 1) ** 2
        for i, s in enumerate(y_pred.shape[2:]):
            if s // weights_div <= self.kernel_size[i] - 1:
                raise ValueError(
                    f"For {len(self.weights)} weights and kernel size "
                    f"{self.kernel_size[i]}, the image size must be larger than "
                    f"{(self.kernel_size[i] - 1) * weights_div}."
                )

        weights = jnp.asarray(self.weights, jnp.float32)
        multiscale = []
        ssim = None
        for _ in range(len(self.weights)):
            ssim, cs = compute_ssim_and_cs(
                y_pred, y, self.spatial_dims, self.data_range, self.kernel_type,
                self.kernel_size, self.kernel_sigma, self.k1, self.k2,
            )
            cs_per_batch = cs.reshape(cs.shape[0], -1).mean(axis=1)
            multiscale.append(jnp.maximum(cs_per_batch, 0.0))
            y_pred = self._avg_pool(y_pred)
            y = self._avg_pool(y)

        ssim_per_batch = ssim.reshape(ssim.shape[0], -1).mean(axis=1)
        multiscale[-1] = jnp.maximum(ssim_per_batch, 0.0)
        stacked = jnp.stack(multiscale)
        ms = jnp.prod(stacked ** weights[:, None], axis=0)
        per_batch = ms.reshape(ms.shape[0], -1).mean(axis=1, keepdims=True)
        return self._reduce(per_batch)
