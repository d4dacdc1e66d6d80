"""SPADE (spatially-adaptive) normalisation, channels-last.

Reference parity: generative/networks/blocks/spade_norm.py:20-96 (SPADE:
param-free instance norm, then `normalized * (1 + gamma(seg)) + beta(seg)`
where gamma/beta come from a shared conv tower over the nearest-resized
segmentation map; the reference's MONAI Convolution defaults add an
instance norm after the gamma/beta convs, mirrored here).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .convolutions import ConvND


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free instance norm over spatial axes of (B, *spatial, C)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def group_norm(x: jnp.ndarray, num_groups: int, eps: float = 1e-6) -> jnp.ndarray:
    """Parameter-free group norm over (spatial, channel-group) of (B, *sp, C)."""
    c = x.shape[-1]
    g = num_groups
    grouped = x.reshape(x.shape[:-1] + (g, c // g))
    axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    mean = jnp.mean(grouped, axis=axes, keepdims=True)
    var = jnp.var(grouped, axis=axes, keepdims=True)
    return ((grouped - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)


def resize_nearest(x: jnp.ndarray, spatial_shape: tuple[int, ...]) -> jnp.ndarray:
    """Nearest-neighbour resize of (B, *spatial, C) to a new spatial shape."""
    out_shape = (x.shape[0],) + tuple(spatial_shape) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="nearest")


class SPADE(nn.Module):
    """Semantic-map-conditioned normalisation block.

    Args:
        label_nc: number of semantic channels in the segmentation map.
        norm_nc: number of channels being normalised.
        kernel_size: conv kernel size of the gamma/beta tower.
        spatial_dims: 2 or 3.
        hidden_channels: width of the shared embedding conv.
    """

    label_nc: int
    norm_nc: int
    kernel_size: int = 3
    spatial_dims: int = 2
    hidden_channels: int = 64
    norm: str = "INSTANCE"
    norm_params: dict | None = None
    norm_eps: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        kind = str(self.norm).upper()
        if kind == "GROUP":
            params = self.norm_params or {}
            normalized = group_norm(x, params.get("num_groups", 32), self.norm_eps)
        elif kind == "INSTANCE":
            normalized = instance_norm(x, self.norm_eps)
        else:
            raise ValueError(f"Unsupported SPADE base norm: {self.norm}")

        segmap = resize_nearest(segmap, x.shape[1:-1])
        pad = self.kernel_size // 2
        actv = ConvND(
            self.spatial_dims,
            self.hidden_channels,
            kernel_size=self.kernel_size,
            padding=pad,
            dtype=self.dtype,
            name="mlp_shared",
        )(segmap)
        actv = nn.leaky_relu(actv, negative_slope=0.01)
        gamma = instance_norm(
            ConvND(
                self.spatial_dims,
                self.norm_nc,
                kernel_size=self.kernel_size,
                padding=pad,
                dtype=self.dtype,
                name="mlp_gamma",
            )(actv),
            self.norm_eps,
        )
        beta = instance_norm(
            ConvND(
                self.spatial_dims,
                self.norm_nc,
                kernel_size=self.kernel_size,
                padding=pad,
                dtype=self.dtype,
                name="mlp_beta",
            )(actv),
            self.norm_eps,
        )
        return normalized * (1.0 + gamma) + beta
