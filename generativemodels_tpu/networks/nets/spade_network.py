"""SPADE VAE-GAN for semantic image synthesis (NVlabs SPADE).

Reference parity: generative/networks/nets/spade_network.py — SPADENet
(:323), SPADEEncoder (:133), SPADEDecoder (:220), SPADEResNetBlock (:43),
KLDLoss (:27). Forward returns (image, kld_loss) in VAE mode; GAN mode
(is_vae=False) seeds the decoder from the downsampled segmentation map.

Note: the reference's GAN-mode fc (spade_network.py:274,307-308) applies a
Linear with mismatched shapes and cannot run; here the GAN path maps the
resized seg's channels to num_channels[0] with a Dense over the channel
axis, which is the NVlabs-SPADE behavior the reference intended.
"""
from __future__ import annotations

import math
from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks.convolutions import ConvND, upsample_nearest
from ..blocks.spade_norm import SPADE, instance_norm, resize_nearest

__all__ = ["SPADENet", "SPADENetEncoder", "SPADENetDecoder", "SPADENetResNetBlock", "kld_loss"]


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, exp(logvar)) || N(0, 1)), summed (reference :27-34)."""
    return -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))


def _act(act):
    if act is None:
        return lambda x: x
    if isinstance(act, (tuple, list)):
        name, kw = act[0], act[1] if len(act) > 1 else {}
    else:
        name, kw = act, {}
    name = str(name).upper()
    if name == "LEAKYRELU":
        return lambda x: nn.leaky_relu(x, kw.get("negative_slope", 0.01))
    if name == "RELU":
        return nn.relu
    if name == "TANH":
        return jnp.tanh
    if name == "SIGMOID":
        return nn.sigmoid
    raise ValueError(f"Unsupported activation {act}")


class SPADENetResNetBlock(nn.Module):
    """SPADE-normalised residual block (reference :43-130)."""

    spatial_dims: int
    in_channels: int
    out_channels: int
    label_nc: int
    spade_intermediate_channels: int = 128
    norm: str = "INSTANCE"
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        int_channels = min(self.in_channels, self.out_channels)
        learned_shortcut = self.in_channels != self.out_channels
        pad = (self.kernel_size - 1) // 2

        spade = lambda nc, name: SPADE(
            label_nc=self.label_nc,
            norm_nc=nc,
            kernel_size=self.kernel_size,
            spatial_dims=self.spatial_dims,
            hidden_channels=self.spade_intermediate_channels,
            norm=self.norm,
            dtype=self.dtype,
            name=name,
        )
        act = lambda x: nn.leaky_relu(x, 0.2)

        if learned_shortcut:
            x_s = ConvND(
                self.spatial_dims, self.out_channels, kernel_size=1, dtype=self.dtype,
                name="conv_s",
            )(spade(self.in_channels, "norm_s")(x, seg))
        else:
            x_s = x

        dx = ConvND(
            self.spatial_dims, int_channels, kernel_size=self.kernel_size, padding=pad,
            dtype=self.dtype, name="conv_0",
        )(act(spade(self.in_channels, "norm_0")(x, seg)))
        dx = ConvND(
            self.spatial_dims, self.out_channels, kernel_size=self.kernel_size, padding=pad,
            dtype=self.dtype, name="conv_1",
        )(act(spade(int_channels, "norm_1")(dx, seg)))
        return x_s + dx


class SPADENetEncoder(nn.Module):
    """Strided-conv VAE encoder to a flat latent (reference :133-217)."""

    spatial_dims: int
    in_channels: int
    z_dim: int
    num_channels: Sequence[int]
    input_shape: Sequence[int]
    kernel_size: int = 3
    norm: str = "INSTANCE"
    act: str | tuple = ("LEAKYRELU", {"negative_slope": 0.2})
    dtype: jnp.dtype | None = None

    def _validate(self):
        if len(self.input_shape) != self.spatial_dims:
            raise ValueError("Length of parameter input shape must match spatial_dims")
        for s in self.input_shape:
            if s % (2 ** len(self.num_channels)) != 0:
                raise ValueError(
                    "Each dimension of your input must be divisible by 2 ** (autoencoder depth)."
                )

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """Image (B, C, *spatial) -> (mu, logvar), each (B, z_dim)."""
        self._validate()
        act = _act(self.act)
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        h = jnp.transpose(x, perm)
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate(self.num_channels):
            h = ConvND(
                self.spatial_dims, ch, kernel_size=self.kernel_size, strides=2, padding=pad,
                dtype=self.dtype, name=f"block_{i}",
            )(h)
            h = instance_norm(h)
            h = act(h)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.z_dim, name="fc_mu")(h)
        logvar = nn.Dense(self.z_dim, name="fc_var")(h)
        return mu, logvar

    def encode(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        mu, logvar = self(x)
        return reparameterize(mu, logvar, key)


def reparameterize(mu: jnp.ndarray, logvar: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, dtype=std.dtype)
    return eps * std + mu


class SPADENetDecoder(nn.Module):
    """SPADE ResNet decoder with x2 upsampling per stage (reference :220-320)."""

    spatial_dims: int
    out_channels: int
    label_nc: int
    input_shape: Sequence[int]
    num_channels: Sequence[int]  # reversed (coarse-to-fine) channel list
    z_dim: int | None = None
    is_gan: bool = False
    spade_intermediate_channels: int = 128
    norm: str = "INSTANCE"
    act: str | tuple = ("LEAKYRELU", {"negative_slope": 0.2})
    last_act: str | tuple | None = ("LEAKYRELU", {"negative_slope": 0.2})
    kernel_size: int = 3
    upsampling_mode: str = "nearest"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, seg: jnp.ndarray, z: jnp.ndarray | None = None) -> jnp.ndarray:
        num_channels = list(self.num_channels)
        latent_spatial = [s // (2 ** len(num_channels)) for s in self.input_shape]
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        inv_perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        seg_cl = jnp.transpose(seg, perm)

        if self.is_gan:
            # torch-convention nearest downscale (reference :307 uses
            # F.interpolate's default mode="nearest")
            small = resize_nearest(seg_cl, tuple(latent_spatial))
            x = nn.Dense(num_channels[0], name="fc")(small)
        else:
            x = nn.Dense(
                int(math.prod(latent_spatial)) * num_channels[0], name="fc"
            )(z)
            x = x.reshape(x.shape[0], *latent_spatial, num_channels[0])

        channel_path = num_channels + [self.out_channels]
        for i in range(len(channel_path) - 1):
            x = SPADENetResNetBlock(
                spatial_dims=self.spatial_dims,
                in_channels=channel_path[i],
                out_channels=channel_path[i + 1],
                label_nc=self.label_nc,
                spade_intermediate_channels=self.spade_intermediate_channels,
                norm=self.norm,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, seg_cl)
            if self.upsampling_mode == "nearest":
                x = upsample_nearest(x, 2)
            else:
                method = {"bilinear": "linear", "bicubic": "cubic"}[self.upsampling_mode]
                x = jax.image.resize(
                    x,
                    (x.shape[0],) + tuple(2 * s for s in x.shape[1:-1]) + (x.shape[-1],),
                    method=method,
                )

        pad = (self.kernel_size - 1) // 2
        x = ConvND(
            self.spatial_dims, self.out_channels, kernel_size=self.kernel_size, padding=pad,
            dtype=self.dtype, name="last_conv",
        )(x)
        x = _act(self.last_act)(x)
        return jnp.transpose(x, inv_perm).astype(jnp.float32)


class SPADENet(nn.Module):
    """SPADE semantic-image-synthesis network (VAE or GAN mode).

    forward(seg, x) -> (image, kld_loss) in VAE mode, (image,) otherwise
    (reference :407-415). Stochastic reparameterisation takes `key` (falls
    back to the 'sampling' flax RNG stream).
    """

    spatial_dims: int
    in_channels: int
    out_channels: int
    label_nc: int
    input_shape: Sequence[int]
    num_channels: Sequence[int]
    z_dim: int | None = None
    is_vae: bool = True
    spade_intermediate_channels: int = 128
    norm: str = "INSTANCE"
    act: str | tuple = ("LEAKYRELU", {"negative_slope": 0.2})
    last_act: str | tuple | None = ("LEAKYRELU", {"negative_slope": 0.2})
    kernel_size: int = 3
    upsampling_mode: str = "nearest"
    dtype: jnp.dtype | None = None

    def setup(self):
        if self.is_vae and self.z_dim is None:
            raise ValueError("z_dim cannot be None when is_vae is True.")
        if self.is_vae:
            self.encoder = SPADENetEncoder(
                spatial_dims=self.spatial_dims,
                in_channels=self.in_channels,
                z_dim=self.z_dim,
                num_channels=tuple(self.num_channels),
                input_shape=tuple(self.input_shape),
                kernel_size=self.kernel_size,
                norm=self.norm,
                act=self.act,
                dtype=self.dtype,
            )
        self.decoder = SPADENetDecoder(
            spatial_dims=self.spatial_dims,
            out_channels=self.out_channels,
            label_nc=self.label_nc,
            input_shape=tuple(self.input_shape),
            num_channels=tuple(reversed(tuple(self.num_channels))),
            z_dim=self.z_dim,
            is_gan=not self.is_vae,
            spade_intermediate_channels=self.spade_intermediate_channels,
            norm=self.norm,
            act=self.act,
            last_act=self.last_act,
            kernel_size=self.kernel_size,
            upsampling_mode=self.upsampling_mode,
            dtype=self.dtype,
        )

    def __call__(self, seg: jnp.ndarray, x: jnp.ndarray | None = None, key=None):
        if self.is_vae:
            if key is None:
                key = self.make_rng("sampling")
            z_mu, z_logvar = self.encoder(x)
            z = reparameterize(z_mu, z_logvar, key)
            return self.decoder(seg, z), kld_loss(z_mu, z_logvar)
        return (self.decoder(seg, None),)

    def encode(self, x: jnp.ndarray, key=None):
        if key is None:
            key = self.make_rng("sampling")
        return self.encoder.encode(x, key)

    def decode(self, seg: jnp.ndarray, z: jnp.ndarray | None = None):
        return self.decoder(seg, z)
