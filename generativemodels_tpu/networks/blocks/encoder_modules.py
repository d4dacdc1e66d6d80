"""Conditioning-image rescaler.

Reference parity: generative/networks/blocks/encoder_modules.py:24-84
(SpatialRescaler from CompVis LDM: n-stage interpolation with optional 1x1
channel mapper).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .convolutions import ConvND

_METHODS = {
    "nearest": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "trilinear": "linear",
    "bicubic": "cubic",
    "area": "area",
}


def _axis_weights(in_s: int, out_s: int, method: str, scale: float):
    """(in_s, out_s) resampling matrix with torch F.interpolate semantics.

    `scale` is torch's coordinate-mapping scale: 1/scale_factor when the
    caller passed scale_factor (recompute_scale_factor=None), in/out when
    it passed an explicit size — the two differ whenever
    floor(in*factor) != in*factor, so this distinction is parity-critical.
    """

    w = np.zeros((in_s, out_s), np.float32)
    if method == "area":
        # adaptive avg pool: averages src [floor(j*in/out), ceil((j+1)*in/out))
        for j in range(out_s):
            a = (j * in_s) // out_s
            b = -((-(j + 1) * in_s) // out_s)
            w[a:b, j] = 1.0 / (b - a)
        return w
    if method == "nearest":
        # legacy asymmetric convention: src = floor(j * scale)
        for j in range(out_s):
            w[min(int(np.floor(j * scale)), in_s - 1), j] = 1.0
        return w
    if method == "linear":
        for j in range(out_s):
            p = max((j + 0.5) * scale - 0.5, 0.0)
            i0 = int(np.floor(p))
            frac = p - i0
            w[min(i0, in_s - 1), j] += 1.0 - frac
            w[min(i0 + 1, in_s - 1), j] += frac
        return w
    if method == "cubic":
        # Keys cubic convolution with torch's a = -0.75, clamped taps
        a = -0.75

        def k(t):
            t = abs(t)
            if t <= 1.0:
                return (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0
            if t < 2.0:
                return a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a
            return 0.0

        for j in range(out_s):
            p = (j + 0.5) * scale - 0.5
            i0 = int(np.floor(p))
            for tap in range(i0 - 1, i0 + 3):
                w[min(max(tap, 0), in_s - 1), j] += k(p - tap)
        return w
    raise ValueError(f"unknown resample method {method!r}")


def _interpolate(
    x: jnp.ndarray,
    size: tuple[int, ...],
    method: str,
    scales: tuple[float, ...] | None = None,
) -> jnp.ndarray:
    """torch F.interpolate on channels-last (B, *spatial, C), exactly:
    nearest's floor convention, linear without antialias, bicubic with
    a=-0.75, area = adaptive avg pool. Separable per-axis weight matrices
    (static shapes), so each axis is one matmul — MXU-friendly."""
    for axis, out_s in enumerate(size, start=1):
        in_s = x.shape[axis]
        if in_s == out_s:
            continue
        scale = scales[axis - 1] if scales is not None else in_s / out_s
        w = _axis_weights(in_s, out_s, method, scale)
        x = jnp.moveaxis(
            jnp.tensordot(x, jnp.asarray(w, x.dtype), axes=[[axis], [0]]), -1, axis
        )
    return x


class SpatialRescaler(nn.Module):
    """Interpolation-based resizer for conditioning images.

    Public layout is (B, C, *spatial) like the other components (the
    reference's F.interpolate semantics); channels-last internally.
    """

    spatial_dims: int = 2
    n_stages: int = 1
    size: Sequence[int] | int | None = None
    method: str = "bilinear"
    multiplier: Sequence[float] | float | None = None
    in_channels: int = 3
    out_channels: int | None = None
    bias: bool = False
    dtype: jnp.dtype | None = None

    def __post_init__(self):
        super().__post_init__()
        if self.n_stages < 0:
            raise ValueError("n_stages must be >= 0")
        if self.method not in _METHODS:
            raise ValueError(f"method must be one of {sorted(_METHODS)}")
        if self.size is not None and self.n_stages != 1:
            raise ValueError("when size is not None, n_stages should be 1.")
        if self.size is not None and self.multiplier is not None:
            raise ValueError("only one of size or multiplier should be defined.")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        inv_perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        x = jnp.transpose(x, perm)
        if self.out_channels is not None:
            x = ConvND(
                self.spatial_dims,
                self.out_channels,
                kernel_size=1,
                use_bias=self.bias,
                dtype=self.dtype,
                name="channel_mapper",
            )(x)

        n = self.spatial_dims
        method = _METHODS[self.method]
        for _ in range(self.n_stages):
            scales = None
            if self.size is not None:
                size = (self.size,) * n if isinstance(self.size, int) else tuple(self.size)
            else:
                mult = self.multiplier
                if mult is None:
                    size = x.shape[1:-1]
                else:
                    mults = (mult,) * n if isinstance(mult, (int, float)) else tuple(mult)
                    size = tuple(int(s * m) for s, m in zip(x.shape[1:-1], mults))
                    # torch maps coordinates with 1/scale_factor, not
                    # in/out — different whenever floor(in*m) != in*m
                    scales = tuple(1.0 / m for m in mults)
            x = _interpolate(x, tuple(size), method, scales)
        return jnp.transpose(x, inv_perm)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x)
