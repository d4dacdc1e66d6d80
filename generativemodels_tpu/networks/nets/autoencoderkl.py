"""KL-regularised autoencoder (LDM stage 1), TPU-native channels-last.

Reference parity: generative/networks/nets/autoencoderkl.py — AutoencoderKL
(:600), Encoder (:315), Decoder (:455), ResBlock (:125), asymmetric-pad
Downsample (:96), Upsample (:41). The bf16 nearest-upsample workaround
(:80-91) is unnecessary on TPU (jnp.repeat handles bf16); activation
checkpointing maps to nn.remat.
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks.attention_blocks import AttentionBlock
from ..blocks.convolutions import ConvND, ConvTransposeND, upsample_nearest
from .diffusion_model_unet import ensure_tuple_rep

__all__ = ["AutoencoderKL", "AEKLEncoder", "AEKLDecoder", "AEKLResBlock"]


class AEKLResBlock(nn.Module):
    """norm -> silu -> conv, twice, with a 1x1 shortcut on channel change."""

    spatial_dims: int
    in_channels: int
    norm_num_groups: int
    norm_eps: float
    out_channels: int | None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype, name="norm1"
        )(x)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims, out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv1",
        )(h)
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype, name="norm2"
        )(h)
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


class _Downsample(nn.Module):
    """Asymmetric (0,1) pad then stride-2 valid conv (reference :96-122)."""

    spatial_dims: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = [(0, 0)] + [(0, 1)] * self.spatial_dims + [(0, 0)]
        x = jnp.pad(x, pad)
        return ConvND(
            self.spatial_dims, x.shape[-1], kernel_size=3, strides=2, padding=0,
            dtype=self.dtype, name="conv",
        )(x)


class _Upsample(nn.Module):
    """Nearest x2 (or transposed conv) then 3x3 conv (reference :41-93)."""

    spatial_dims: int
    in_channels: int
    use_convtranspose: bool
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_convtranspose:
            return ConvTransposeND(
                self.spatial_dims, self.in_channels, kernel_size=3, strides=2, padding=1,
                output_padding=1, dtype=self.dtype, name="conv",
            )(x)
        return ConvND(
            self.spatial_dims, self.in_channels, kernel_size=3, padding=1, dtype=self.dtype,
            nearest_upsample=True, name="conv",
        )(x)


class AEKLEncoder(nn.Module):
    """Conv cascade downsampling to the spatial latent (reference :315)."""

    spatial_dims: int
    in_channels: int
    num_channels: Sequence[int]
    out_channels: int
    num_res_blocks: Sequence[int]
    norm_num_groups: int
    norm_eps: float
    attention_levels: Sequence[bool]
    with_nonlocal_attn: bool = True
    use_flash_attention: bool | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_channels = tuple(self.num_channels)
        h = ConvND(
            self.spatial_dims, num_channels[0], kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)

        output_channel = num_channels[0]
        for i in range(len(num_channels)):
            input_channel = output_channel
            output_channel = num_channels[i]
            for j in range(self.num_res_blocks[i]):
                h = AEKLResBlock(
                    self.spatial_dims, input_channel, self.norm_num_groups, self.norm_eps,
                    output_channel, dtype=self.dtype, name=f"res_{i}_{j}",
                )(h)
                input_channel = output_channel
                if self.attention_levels[i]:
                    h = AttentionBlock(
                        spatial_dims=self.spatial_dims, num_channels=input_channel,
                        norm_num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                        use_flash_attention=self.use_flash_attention, dtype=self.dtype,
                        name=f"attn_{i}_{j}",
                    )(h)
            if i != len(num_channels) - 1:
                h = _Downsample(self.spatial_dims, dtype=self.dtype, name=f"down_{i}")(h)

        if self.with_nonlocal_attn:
            h = AEKLResBlock(
                self.spatial_dims, num_channels[-1], self.norm_num_groups, self.norm_eps,
                num_channels[-1], dtype=self.dtype, name="mid_res_1",
            )(h)
            h = AttentionBlock(
                spatial_dims=self.spatial_dims, num_channels=num_channels[-1],
                norm_num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                use_flash_attention=self.use_flash_attention, dtype=self.dtype,
                name="mid_attn",
            )(h)
            h = AEKLResBlock(
                self.spatial_dims, num_channels[-1], self.norm_num_groups, self.norm_eps,
                num_channels[-1], dtype=self.dtype, name="mid_res_2",
            )(h)

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype,
            name="norm_out",
        )(h)
        return ConvND(
            self.spatial_dims, self.out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)


class AEKLDecoder(nn.Module):
    """Conv cascade upsampling from the latent to image space (reference :455)."""

    spatial_dims: int
    num_channels: Sequence[int]
    in_channels: int
    out_channels: int
    num_res_blocks: Sequence[int]
    norm_num_groups: int
    norm_eps: float
    attention_levels: Sequence[bool]
    with_nonlocal_attn: bool = True
    use_flash_attention: bool | None = None
    use_convtranspose: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        reversed_channels = list(reversed(tuple(self.num_channels)))
        reversed_attention = list(reversed(tuple(self.attention_levels)))
        reversed_res_blocks = list(reversed(tuple(self.num_res_blocks)))

        h = ConvND(
            self.spatial_dims, reversed_channels[0], kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_in",
        )(z)

        if self.with_nonlocal_attn:
            h = AEKLResBlock(
                self.spatial_dims, reversed_channels[0], self.norm_num_groups, self.norm_eps,
                reversed_channels[0], dtype=self.dtype, name="mid_res_1",
            )(h)
            h = AttentionBlock(
                spatial_dims=self.spatial_dims, num_channels=reversed_channels[0],
                norm_num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                use_flash_attention=self.use_flash_attention, dtype=self.dtype,
                name="mid_attn",
            )(h)
            h = AEKLResBlock(
                self.spatial_dims, reversed_channels[0], self.norm_num_groups, self.norm_eps,
                reversed_channels[0], dtype=self.dtype, name="mid_res_2",
            )(h)

        block_out_ch = reversed_channels[0]
        for i in range(len(reversed_channels)):
            block_in_ch = block_out_ch
            block_out_ch = reversed_channels[i]
            for j in range(reversed_res_blocks[i]):
                h = AEKLResBlock(
                    self.spatial_dims, block_in_ch, self.norm_num_groups, self.norm_eps,
                    block_out_ch, dtype=self.dtype, name=f"res_{i}_{j}",
                )(h)
                block_in_ch = block_out_ch
                if reversed_attention[i]:
                    h = AttentionBlock(
                        spatial_dims=self.spatial_dims, num_channels=block_in_ch,
                        norm_num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                        use_flash_attention=self.use_flash_attention, dtype=self.dtype,
                        name=f"attn_{i}_{j}",
                    )(h)
            if i != len(reversed_channels) - 1:
                h = _Upsample(
                    self.spatial_dims, block_in_ch, self.use_convtranspose, dtype=self.dtype,
                    name=f"up_{i}",
                )(h)

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype,
            name="norm_out",
        )(h)
        return ConvND(
            self.spatial_dims, self.out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)


class AutoencoderKL(nn.Module):
    """VAE with KL-regularised latent space (LDM stage 1).

    Public API matches the reference (:718-799): encode / sampling /
    reconstruct / decode / __call__ / encode_stage_2_inputs /
    decode_stage_2_outputs, all in (B, C, *spatial) layout. Stochastic
    sampling takes an explicit PRNG `key` (falls back to the 'sampling'
    flax RNG stream).
    """

    spatial_dims: int
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
    use_checkpointing: bool = False
    use_convtranspose: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        num_channels = tuple(self.num_channels)
        attention_levels = tuple(self.attention_levels)
        if any((c % self.norm_num_groups) != 0 for c in num_channels):
            raise ValueError(
                "AutoencoderKL expects all num_channels being multiple of norm_num_groups"
            )
        if len(num_channels) != len(attention_levels):
            raise ValueError(
                "AutoencoderKL expects num_channels being same size of attention_levels"
            )
        num_res_blocks = ensure_tuple_rep(self.num_res_blocks, len(num_channels))

        encoder_cls = nn.remat(AEKLEncoder) if self.use_checkpointing else AEKLEncoder
        decoder_cls = nn.remat(AEKLDecoder) if self.use_checkpointing else AEKLDecoder

        self.encoder = encoder_cls(
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
        self.decoder = decoder_cls(
            spatial_dims=self.spatial_dims,
            num_channels=num_channels,
            in_channels=self.latent_channels,
            out_channels=self.out_channels,
            num_res_blocks=num_res_blocks,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            attention_levels=attention_levels,
            with_nonlocal_attn=self.with_decoder_nonlocal_attn,
            use_flash_attention=self.use_flash_attention,
            use_convtranspose=self.use_convtranspose,
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

    # layout helpers: public NC*, internal channels-last
    def _to_cl(self, x):
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        x = jnp.transpose(x, perm)
        return x.astype(self.dtype) if self.dtype is not None else x

    def _from_cl(self, x):
        perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        return jnp.transpose(x, perm).astype(jnp.float32)

    def encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Image -> (z_mu, z_sigma), each (B, latent_channels, *latent_spatial)."""
        h = self.encoder(self._to_cl(x))
        z_mu = self.quant_conv_mu(h)
        z_log_var = jnp.clip(self.quant_conv_log_sigma(h), -30.0, 20.0)
        z_sigma = jnp.exp(z_log_var / 2)
        return self._from_cl(z_mu), self._from_cl(z_sigma)

    def sampling(self, z_mu: jnp.ndarray, z_sigma: jnp.ndarray, key=None) -> jnp.ndarray:
        """Reparameterised gaussian sample z = mu + eps * sigma."""
        if key is None:
            key = self.make_rng("sampling")
        eps = jax.random.normal(key, z_sigma.shape, dtype=z_sigma.dtype)
        return z_mu + eps * z_sigma

    def reconstruct(self, x: jnp.ndarray) -> jnp.ndarray:
        z_mu, _ = self.encode(x)
        return self.decode(z_mu)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = self.post_quant_conv(self._to_cl(z))
        return self._from_cl(self.decoder(h))

    def __call__(self, x: jnp.ndarray, key=None):
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma, key=key)
        reconstruction = self.decode(z)
        return reconstruction, z_mu, z_sigma

    def encode_stage_2_inputs(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        z_mu, z_sigma = self.encode(x)
        return self.sampling(z_mu, z_sigma, key=key)

    def decode_stage_2_outputs(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decode(z)
