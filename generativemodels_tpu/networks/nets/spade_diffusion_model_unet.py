"""SPADE-conditioned diffusion UNet (semantic conditioning on the up path).

Reference parity: generative/networks/nets/spade_diffusion_model_unet.py —
SPADEDiffusionModelUNet (:612), SPADEResnetBlock (:72), SPADE up blocks
(:203/:300/:414), get_spade_up_block (:537). Down/mid path is identical to
the plain DiffusionModelUNet; the up-path ResNet blocks use SPADE norms
driven by a segmentation map; forward takes `seg` (reference :836) and the
module exposes `label_nc` which the inferers check.
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import get_timestep_embedding
from ..blocks.attention_blocks import AttentionBlock, SpatialTransformer
from ..blocks.convolutions import ConvND, avg_pool, upsample_nearest
from ..blocks.spade_norm import SPADE
from .diffusion_model_unet import (
    DownBlock,
    MidBlock,
    Upsample,
    _validate_unet_args,
    ensure_tuple_rep,
)

__all__ = ["SPADEDiffusionModelUNet", "SPADEResnetBlock", "SPADEUpBlock"]


class SPADEResnetBlock(nn.Module):
    """Timestep-conditioned ResNet block with SPADE norms (reference :72)."""

    spatial_dims: int
    in_channels: int
    temb_channels: int
    label_nc: int
    out_channels: int | None = None
    up: bool = False
    down: bool = False
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spade_intermediate_channels: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        spade = lambda nc, name: SPADE(
            label_nc=self.label_nc,
            norm_nc=nc,
            norm="GROUP",
            # reference spade_diffusion_model_unet.py:110-118: the SPADE base
            # GroupNorm here is AFFINE (learnable weight/bias), with eps from
            # the net's norm_eps
            norm_params={
                "num_groups": self.norm_num_groups,
                "eps": self.norm_eps,
                "affine": True,
            },
            hidden_channels=self.spade_intermediate_channels,
            kernel_size=3,
            spatial_dims=self.spatial_dims,
            dtype=self.dtype,
            name=name,
        )

        h = spade(self.in_channels, "norm1")(x, seg)
        h = nn.silu(h)

        up_fused = self.up  # h's upsample fuses into conv1 on the 3D path
        if self.up:
            x = upsample_nearest(x, 2)
        elif self.down:
            x = avg_pool(x, 2)
            h = avg_pool(h, 2)

        h = ConvND(
            self.spatial_dims, out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            nearest_upsample=up_fused, name="conv1",
        )(h)

        temb = nn.Dense(out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(emb))
        h = h + temb.reshape(temb.shape[0], *([1] * self.spatial_dims), out_channels)

        h = spade(out_channels, "norm2")(h, seg)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims, out_channels, kernel_size=3, padding=1, zero_init=True,
            dtype=self.dtype, name="conv2",
        )(h)

        if out_channels == self.in_channels:
            skip = x
        else:
            skip = ConvND(
                self.spatial_dims, out_channels, kernel_size=1, dtype=self.dtype,
                name="skip_connection",
            )(x)
        return skip + h


class SPADEUpBlock(nn.Module):
    """Up-path stage with SPADE resnets (+ optional attn / cross-attn)."""

    spatial_dims: int
    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    label_nc: int
    num_res_blocks: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    add_upsample: bool = True
    resblock_updown: bool = False
    with_attn: bool = False
    with_cross_attn: bool = False
    num_head_channels: int = 1
    transformer_num_layers: int = 1
    cross_attention_dim: int | None = None
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    spade_intermediate_channels: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        res_hidden_states_list: list[jnp.ndarray],
        temb: jnp.ndarray,
        seg: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        res_list = list(res_hidden_states_list)
        for i in range(self.num_res_blocks):
            res_skip_channels = (
                self.in_channels if (i == self.num_res_blocks - 1) else self.out_channels
            )
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels

            res_hidden = res_list.pop()
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = SPADEResnetBlock(
                spatial_dims=self.spatial_dims,
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                label_nc=self.label_nc,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                spade_intermediate_channels=self.spade_intermediate_channels,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(hidden_states, temb, seg)
            if self.with_attn:
                hidden_states = AttentionBlock(
                    spatial_dims=self.spatial_dims,
                    num_channels=self.out_channels,
                    num_head_channels=self.num_head_channels,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    use_flash_attention=self.use_flash_attention,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(hidden_states)
            elif self.with_cross_attn:
                hidden_states = SpatialTransformer(
                    spatial_dims=self.spatial_dims,
                    in_channels=self.out_channels,
                    num_attention_heads=self.out_channels // self.num_head_channels,
                    num_head_channels=self.num_head_channels,
                    num_layers=self.transformer_num_layers,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    cross_attention_dim=self.cross_attention_dim,
                    upcast_attention=self.upcast_attention,
                    use_flash_attention=self.use_flash_attention,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(hidden_states, context=context, deterministic=deterministic)

        if self.add_upsample:
            if self.resblock_updown:
                hidden_states = SPADEResnetBlock(
                    spatial_dims=self.spatial_dims,
                    in_channels=self.out_channels,
                    out_channels=self.out_channels,
                    temb_channels=self.temb_channels,
                    label_nc=self.label_nc,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    spade_intermediate_channels=self.spade_intermediate_channels,
                    up=True,
                    dtype=self.dtype,
                    name="upsampler",
                )(hidden_states, temb, seg)
            else:
                hidden_states = Upsample(
                    spatial_dims=self.spatial_dims,
                    num_channels=self.out_channels,
                    use_conv=True,
                    out_channels=self.out_channels,
                    dtype=self.dtype,
                    name="upsampler",
                )(hidden_states)
        return hidden_states


def get_spade_up_block(**kwargs) -> SPADEUpBlock:
    """Factory mirroring reference get_spade_up_block (:537)."""
    return SPADEUpBlock(**kwargs)


class SPADEDiffusionModelUNet(nn.Module):
    """DiffusionModelUNet with a SPADE-normalised up path (reference :612)."""

    spatial_dims: int
    in_channels: int
    out_channels: int
    label_nc: int
    num_res_blocks: Sequence[int] | int = (2, 2, 2, 2)
    num_channels: Sequence[int] = (32, 64, 64, 64)
    attention_levels: Sequence[bool] = (False, False, True, True)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    resblock_updown: bool = False
    num_head_channels: int | Sequence[int] = 8
    with_conditioning: bool = False
    transformer_num_layers: int = 1
    cross_attention_dim: int | None = None
    num_class_embeds: int | None = None
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    spade_intermediate_channels: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        seg: jnp.ndarray,
        context: jnp.ndarray | None = None,
        class_labels: jnp.ndarray | None = None,
        down_block_additional_residuals: Sequence[jnp.ndarray] | None = None,
        mid_block_additional_residual: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        num_channels = tuple(self.num_channels)
        attention_levels = tuple(self.attention_levels)
        head_channels = ensure_tuple_rep(self.num_head_channels, len(attention_levels))
        res_blocks = ensure_tuple_rep(self.num_res_blocks, len(num_channels))
        _validate_unet_args(
            num_channels, attention_levels, self.norm_num_groups, head_channels,
            res_blocks, self.with_conditioning, self.cross_attention_dim,
        )
        if context is not None and not self.with_conditioning:
            raise ValueError("model should have with_conditioning = True if context is provided")

        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        inv_perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        h = jnp.transpose(x, perm)
        seg_cl = jnp.transpose(seg, perm)
        if self.dtype is not None:
            h = h.astype(self.dtype)
            seg_cl = seg_cl.astype(self.dtype)

        time_embed_dim = num_channels[0] * 4
        t_emb = get_timestep_embedding(timesteps, num_channels[0]).astype(h.dtype)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if self.num_class_embeds is not None:
            if class_labels is None:
                raise ValueError("class_labels should be provided when num_class_embeds > 0")
            class_emb = nn.Embed(
                self.num_class_embeds, time_embed_dim, name="class_embedding"
            )(class_labels)
            emb = emb + class_emb.astype(h.dtype)

        h = ConvND(
            self.spatial_dims, num_channels[0], kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_in",
        )(h)

        down_block_res_samples = [h]
        output_channel = num_channels[0]
        for i in range(len(num_channels)):
            input_channel = output_channel
            output_channel = num_channels[i]
            is_final_block = i == len(num_channels) - 1
            h, res_samples = DownBlock(
                spatial_dims=self.spatial_dims,
                in_channels=input_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
                num_res_blocks=res_blocks[i],
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                add_downsample=not is_final_block,
                resblock_updown=self.resblock_updown,
                with_attn=attention_levels[i] and not self.with_conditioning,
                with_cross_attn=attention_levels[i] and self.with_conditioning,
                num_head_channels=head_channels[i],
                transformer_num_layers=self.transformer_num_layers,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype,
                name=f"down_{i}",
            )(h, emb, context=context, deterministic=deterministic)
            down_block_res_samples.extend(res_samples)

        if down_block_additional_residuals is not None:
            down_block_res_samples = [
                s + jnp.transpose(r, perm).astype(s.dtype)
                for s, r in zip(down_block_res_samples, down_block_additional_residuals)
            ]

        h = MidBlock(
            spatial_dims=self.spatial_dims,
            in_channels=num_channels[-1],
            temb_channels=time_embed_dim,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_conditioning=self.with_conditioning,
            num_head_channels=head_channels[-1],
            transformer_num_layers=self.transformer_num_layers,
            cross_attention_dim=self.cross_attention_dim,
            upcast_attention=self.upcast_attention,
            use_flash_attention=self.use_flash_attention,
            dtype=self.dtype,
            name="middle_block",
        )(h, emb, context=context, deterministic=deterministic)

        if mid_block_additional_residual is not None:
            h = h + jnp.transpose(mid_block_additional_residual, perm).astype(h.dtype)

        reversed_channels = list(reversed(num_channels))
        reversed_res_blocks = list(reversed(res_blocks))
        reversed_attention = list(reversed(attention_levels))
        reversed_heads = list(reversed(head_channels))
        output_channel = reversed_channels[0]
        for i in range(len(reversed_channels)):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(num_channels) - 1)]
            is_final_block = i == len(num_channels) - 1
            n_res = reversed_res_blocks[i] + 1

            res_samples = down_block_res_samples[-n_res:]
            down_block_res_samples = down_block_res_samples[:-n_res]

            h = SPADEUpBlock(
                spatial_dims=self.spatial_dims,
                in_channels=input_channel,
                prev_output_channel=prev_output_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
                label_nc=self.label_nc,
                num_res_blocks=n_res,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                add_upsample=not is_final_block,
                resblock_updown=self.resblock_updown,
                with_attn=reversed_attention[i] and not self.with_conditioning,
                with_cross_attn=reversed_attention[i] and self.with_conditioning,
                num_head_channels=reversed_heads[i],
                transformer_num_layers=self.transformer_num_layers,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                use_flash_attention=self.use_flash_attention,
                spade_intermediate_channels=self.spade_intermediate_channels,
                dtype=self.dtype,
                name=f"up_{i}",
            )(h, res_samples, emb, seg_cl, context=context, deterministic=deterministic)

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype,
            name="out_norm",
        )(h)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims, self.out_channels, kernel_size=3, padding=1, zero_init=True,
            dtype=self.dtype, name="out_conv",
        )(h)
        return jnp.transpose(h, inv_perm).astype(jnp.float32)
