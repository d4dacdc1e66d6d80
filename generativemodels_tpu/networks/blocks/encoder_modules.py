"""Conditioning-image rescaler.

Reference parity: generative/networks/blocks/encoder_modules.py:24-84
(SpatialRescaler from CompVis LDM: n-stage interpolation with optional 1x1
channel mapper).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .convolutions import ConvND

_METHODS = {
    "nearest": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "trilinear": "linear",
    "bicubic": "cubic",
    "area": "linear",
}


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
            if self.size is not None:
                size = (self.size,) * n if isinstance(self.size, int) else tuple(self.size)
            else:
                mult = self.multiplier
                if mult is None:
                    size = x.shape[1:-1]
                elif isinstance(mult, (int, float)):
                    size = tuple(int(s * mult) for s in x.shape[1:-1])
                else:
                    size = tuple(int(s * m) for s, m in zip(x.shape[1:-1], mult))
            x = jax.image.resize(x, (x.shape[0], *size, x.shape[-1]), method=method)
        return jnp.transpose(x, inv_perm)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x)
