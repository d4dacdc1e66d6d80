"""SPADE-conditioned AutoencoderKL (semantic-map-conditioned decoder).

Reference parity: generative/networks/nets/spade_autoencoderkl.py —
SPADEAutoencoderKL (:292), SPADEDecoder (:137), SPADEResBlock (:42). The
encoder is the plain AEKL encoder; decoder ResBlocks swap GroupNorm for
SPADE norm driven by a segmentation map; decode takes (z, seg).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks.attention_blocks import AttentionBlock
from ..blocks.convolutions import ConvND, upsample_nearest
from ..blocks.spade_norm import SPADE
from .autoencoderkl import AEKLEncoder, _Upsample
from .diffusion_model_unet import ensure_tuple_rep

__all__ = ["SPADEAutoencoderKL", "SPADEAEKLDecoder", "SPADEAEKLResBlock"]


class SPADEAEKLResBlock(nn.Module):
    """AEKL ResBlock with SPADE(GROUP) norms conditioned on a seg map."""

    spatial_dims: int
    in_channels: int
    norm_num_groups: int
    norm_eps: float
    out_channels: int | None
    label_nc: int
    spade_intermediate_channels: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        spade = lambda nc, name: SPADE(
            label_nc=self.label_nc,
            norm_nc=nc,
            norm="GROUP",
            # reference spade_autoencoderkl.py:72-98: affine=False and NO eps
            # in norm_params — the SPADE base GroupNorm runs at the torch
            # default eps=1e-5 even though the net's norm_eps is 1e-6
            norm_params={"num_groups": self.norm_num_groups, "affine": False},
            hidden_channels=self.spade_intermediate_channels,
            kernel_size=3,
            spatial_dims=self.spatial_dims,
            dtype=self.dtype,
            name=name,
        )
        h = spade(self.in_channels, "norm1")(x, seg)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims, out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv1",
        )(h)
        h = spade(out_channels, "norm2")(h, seg)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims, out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv2",
        )(h)
        if self.in_channels != out_channels:
            x = ConvND(
                self.spatial_dims, out_channels, kernel_size=1, dtype=self.dtype,
                name="nin_shortcut",
            )(x)
        return x + h


class SPADEAEKLDecoder(nn.Module):
    """AEKL decoder with SPADE ResBlocks (reference :137-289)."""

    spatial_dims: int
    num_channels: Sequence[int]
    in_channels: int
    out_channels: int
    num_res_blocks: Sequence[int]
    norm_num_groups: int
    norm_eps: float
    attention_levels: Sequence[bool]
    label_nc: int
    with_nonlocal_attn: bool = True
    use_flash_attention: bool | None = None
    spade_intermediate_channels: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        reversed_channels = list(reversed(tuple(self.num_channels)))
        reversed_attention = list(reversed(tuple(self.attention_levels)))
        reversed_res_blocks = list(reversed(tuple(self.num_res_blocks)))

        res = lambda in_ch, out_ch, name: SPADEAEKLResBlock(
            self.spatial_dims, in_ch, self.norm_num_groups, self.norm_eps, out_ch,
            self.label_nc, self.spade_intermediate_channels, dtype=self.dtype, name=name,
        )

        h = ConvND(
            self.spatial_dims, reversed_channels[0], kernel_size=3, padding=1,
            dtype=self.dtype, name="conv_in",
        )(z)

        if self.with_nonlocal_attn:
            h = res(reversed_channels[0], reversed_channels[0], "mid_res_1")(h, seg)
            h = AttentionBlock(
                spatial_dims=self.spatial_dims, num_channels=reversed_channels[0],
                norm_num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                use_flash_attention=self.use_flash_attention, dtype=self.dtype,
                name="mid_attn",
            )(h)
            h = res(reversed_channels[0], reversed_channels[0], "mid_res_2")(h, seg)

        block_out_ch = reversed_channels[0]
        for i in range(len(reversed_channels)):
            block_in_ch = block_out_ch
            block_out_ch = reversed_channels[i]
            for j in range(reversed_res_blocks[i]):
                h = res(block_in_ch, block_out_ch, f"res_{i}_{j}")(h, seg)
                block_in_ch = block_out_ch
                if reversed_attention[i]:
                    h = AttentionBlock(
                        spatial_dims=self.spatial_dims, num_channels=block_in_ch,
                        norm_num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                        use_flash_attention=self.use_flash_attention, dtype=self.dtype,
                        name=f"attn_{i}_{j}",
                    )(h)
            if i != len(reversed_channels) - 1:
                # same module layout as the plain AEKL decoder (up_{i}.conv)
                # so reference checkpoints map identically in zoo_convert
                h = _Upsample(
                    self.spatial_dims, block_in_ch, use_convtranspose=False,
                    dtype=self.dtype, name=f"up_{i}",
                )(h)

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype,
            name="norm_out",
        )(h)
        return ConvND(
            self.spatial_dims, self.out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)


class SPADEAutoencoderKL(nn.Module):
    """AutoencoderKL whose decoder is SPADE-conditioned on a segmentation map.

    Public API matches the reference (:410-484): encode / sampling /
    reconstruct(x, seg) / decode(z, seg) / __call__(x, seg) /
    encode_stage_2_inputs / decode_stage_2_outputs(z, seg).
    """

    spatial_dims: int
    label_nc: int
    in_channels: int = 1
    out_channels: int = 1
    num_res_blocks: Sequence[int] | int = (2, 2, 2, 2)
    num_channels: Sequence[int] = (32, 64, 64, 64)
    attention_levels: Sequence[bool] = (False, False, True, True)
    latent_channels: int = 3
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    with_encoder_nonlocal_attn: bool = True
    with_decoder_nonlocal_attn: bool = True
    use_flash_attention: bool | None = None
    spade_intermediate_channels: int = 128
    dtype: jnp.dtype | None = None

    def setup(self):
        num_channels = tuple(self.num_channels)
        attention_levels = tuple(self.attention_levels)
        if any((c % self.norm_num_groups) != 0 for c in num_channels):
            raise ValueError(
                "SPADEAutoencoderKL expects all num_channels being multiple of norm_num_groups"
            )
        if len(num_channels) != len(attention_levels):
            raise ValueError(
                "SPADEAutoencoderKL expects num_channels being same size of attention_levels"
            )
        num_res_blocks = ensure_tuple_rep(self.num_res_blocks, len(num_channels))

        self.encoder = AEKLEncoder(
            spatial_dims=self.spatial_dims,
            in_channels=self.in_channels,
            num_channels=num_channels,
            out_channels=self.latent_channels,
            num_res_blocks=num_res_blocks,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            attention_levels=attention_levels,
            with_nonlocal_attn=self.with_encoder_nonlocal_attn,
            use_flash_attention=self.use_flash_attention,
            dtype=self.dtype,
        )
        self.decoder = SPADEAEKLDecoder(
            spatial_dims=self.spatial_dims,
            num_channels=num_channels,
            in_channels=self.latent_channels,
            out_channels=self.out_channels,
            num_res_blocks=num_res_blocks,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            attention_levels=attention_levels,
            label_nc=self.label_nc,
            with_nonlocal_attn=self.with_decoder_nonlocal_attn,
            use_flash_attention=self.use_flash_attention,
            spade_intermediate_channels=self.spade_intermediate_channels,
            dtype=self.dtype,
        )
        self.quant_conv_mu = ConvND(
            self.spatial_dims, self.latent_channels, kernel_size=1, dtype=self.dtype
        )
        self.quant_conv_log_sigma = ConvND(
            self.spatial_dims, self.latent_channels, kernel_size=1, dtype=self.dtype
        )
        self.post_quant_conv = ConvND(
            self.spatial_dims, self.latent_channels, kernel_size=1, dtype=self.dtype
        )

    def _to_cl(self, x):
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        x = jnp.transpose(x, perm)
        return x.astype(self.dtype) if self.dtype is not None else x

    def _from_cl(self, x):
        perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        return jnp.transpose(x, perm).astype(jnp.float32)

    def encode(self, x: jnp.ndarray):
        h = self.encoder(self._to_cl(x))
        z_mu = self.quant_conv_mu(h)
        z_log_var = jnp.clip(self.quant_conv_log_sigma(h), -30.0, 20.0)
        z_sigma = jnp.exp(z_log_var / 2)
        return self._from_cl(z_mu), self._from_cl(z_sigma)

    def sampling(self, z_mu, z_sigma, key=None):
        if key is None:
            key = self.make_rng("sampling")
        eps = jax.random.normal(key, z_sigma.shape, dtype=z_sigma.dtype)
        return z_mu + eps * z_sigma

    def reconstruct(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        z_mu, _ = self.encode(x)
        return self.decode(z_mu, seg)

    def decode(self, z: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        h = self.post_quant_conv(self._to_cl(z))
        return self._from_cl(self.decoder(h, self._to_cl(seg)))

    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray, key=None):
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma, key=key)
        reconstruction = self.decode(z, seg)
        return reconstruction, z_mu, z_sigma

    def encode_stage_2_inputs(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        z_mu, z_sigma = self.encode(x)
        return self.sampling(z_mu, z_sigma, key=key)

    def decode_stage_2_outputs(self, z: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        return self.decode(z, seg)
