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
    """Nearest-neighbour resize of (B, *spatial, C) to a new spatial shape.

    Uses torch's F.interpolate(mode="nearest") index convention
    src = floor(dst * in/out) — NOT jax.image.resize's half-offset
    rounding, which picks different source pixels when downscaling (the
    SPADE towers downscale the seg map to every interior resolution, so
    the convention is parity-load-bearing; reference spade_norm.py:92).
    """
    for axis, out_s in enumerate(spatial_shape, start=1):
        in_s = x.shape[axis]
        if in_s == out_s:
            continue
        idx = jnp.floor(jnp.arange(out_s) * (in_s / out_s)).astype(jnp.int32)
        x = jnp.take(x, idx, axis=axis)
    return x


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
        params = self.norm_params or {}
        if kind == "GROUP":
            # Mirror the reference norm factory exactly: `norm_params` feeds
            # torch.nn.GroupNorm, whose defaults are eps=1e-5, affine=True
            # (SPADEDiffusionModelUNet passes affine=True + eps=norm_eps,
            # spade_diffusion_model_unet.py:114; SPADEAutoencoderKL passes
            # affine=False and NO eps, spade_autoencoderkl.py:76).
            eps = params.get("eps", self.norm_eps)
            if params.get("affine", True):
                normalized = nn.GroupNorm(
                    num_groups=params.get("num_groups", 32), epsilon=eps,
                    dtype=self.dtype, name="param_free_norm",
                )(x)
            else:
                normalized = group_norm(x, params.get("num_groups", 32), eps)
        elif kind == "INSTANCE":
            if params.get("affine", False):
                raise ValueError(
                    "affine INSTANCE SPADE base norm is not supported "
                    "(the reference never constructs it; torch InstanceNorm "
                    "defaults to affine=False)"
                )
            normalized = instance_norm(x, params.get("eps", self.norm_eps))
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
