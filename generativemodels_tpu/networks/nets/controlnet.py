"""ControlNet: a zero-initialised control branch for diffusion UNets.

Reference parity: generative/networks/nets/controlnet.py — ControlNet
(:147), ControlNetConditioningEmbedding (:45), copy_weights_to_controlnet
(:125). The down+mid path mirrors DiffusionModelUNet; per-residual 1x1
"controlnet blocks" are zero-initialised so an untrained ControlNet leaves
the UNet unchanged; weights are seeded from a trained UNet by params-dict
transfer (the JAX analogue of non-strict load_state_dict).
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops import get_timestep_embedding
from ..blocks.convolutions import ConvND
from .diffusion_model_unet import DownBlock, MidBlock, _validate_unet_args, ensure_tuple_rep

__all__ = ["ControlNet", "ControlNetConditioningEmbedding", "copy_weights_to_controlnet"]


class ControlNetConditioningEmbedding(nn.Module):
    """Strided-conv encoder projecting the conditioning image to feature space."""

    spatial_dims: int
    in_channels: int
    out_channels: int
    num_channels: Sequence[int] = (16, 32, 96, 256)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, conditioning: jnp.ndarray) -> jnp.ndarray:
        h = ConvND(
            self.spatial_dims, self.num_channels[0], kernel_size=3, padding=1,
            dtype=self.dtype, name="conv_in",
        )(conditioning)
        h = nn.silu(h)
        for i in range(len(self.num_channels) - 1):
            h = ConvND(
                self.spatial_dims, self.num_channels[i], kernel_size=3, padding=1,
                dtype=self.dtype, name=f"block_{2 * i}",
            )(h)
            h = nn.silu(h)
            h = ConvND(
                self.spatial_dims, self.num_channels[i + 1], kernel_size=3, strides=2,
                padding=1, dtype=self.dtype, name=f"block_{2 * i + 1}",
            )(h)
            h = nn.silu(h)
        return ConvND(
            self.spatial_dims, self.out_channels, kernel_size=3, padding=1, zero_init=True,
            dtype=self.dtype, name="conv_out",
        )(h)


class ControlNet(nn.Module):
    """UNet down+mid clone emitting zero-initialised control residuals.

    Forward contract matches the reference (:367-436): returns
    `(down_block_res_samples, mid_block_res_sample)` scaled by
    `conditioning_scale`, in (B, C, *spatial) layout — directly feedable to
    DiffusionModelUNet's ControlNet hooks.
    """

    spatial_dims: int
    in_channels: int
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
    conditioning_embedding_in_channels: int = 1
    conditioning_embedding_num_channels: Sequence[int] = (16, 32, 96, 256)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        controlnet_cond: jnp.ndarray,
        conditioning_scale: float = 1.0,
        context: jnp.ndarray | None = None,
        class_labels: jnp.ndarray | None = None,
        deterministic: bool = True,
    ):
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
        cond = jnp.transpose(controlnet_cond, perm)
        if self.dtype is not None:
            h = h.astype(self.dtype)
            cond = cond.astype(self.dtype)

        # 1. time (+ class) embedding — mirrors the UNet so weights transfer
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

        # 2. initial conv + conditioning injection
        h = ConvND(
            self.spatial_dims, num_channels[0], kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_in",
        )(h)
        h = h + ControlNetConditioningEmbedding(
            spatial_dims=self.spatial_dims,
            in_channels=self.conditioning_embedding_in_channels,
            out_channels=num_channels[0],
            num_channels=tuple(self.conditioning_embedding_num_channels),
            dtype=self.dtype,
            name="controlnet_cond_embedding",
        )(cond)

        # 3. down path (identical wiring to DiffusionModelUNet)
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

        # 4. mid
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

        # 5. zero-initialised 1x1 controlnet heads on every residual
        controlled = []
        for idx, sample in enumerate(down_block_res_samples):
            out = ConvND(
                self.spatial_dims, sample.shape[-1], kernel_size=1, zero_init=True,
                dtype=self.dtype, name=f"controlnet_down_{idx}",
            )(sample)
            controlled.append(
                jnp.transpose(out, inv_perm).astype(jnp.float32) * conditioning_scale
            )
        mid = ConvND(
            self.spatial_dims, h.shape[-1], kernel_size=1, zero_init=True, dtype=self.dtype,
            name="controlnet_mid_block",
        )(h)
        mid = jnp.transpose(mid, inv_perm).astype(jnp.float32) * conditioning_scale

        return controlled, mid


def copy_weights_to_controlnet(controlnet_params, diffusion_params, verbose: bool = True):
    """Seed ControlNet params from a trained DiffusionModelUNet's params.

    Copies every param subtree whose path exists in both models with matching
    leaf shapes (conv_in, time_embed_*, class_embedding, down_*, middle_block)
    — the JAX analogue of the reference's non-strict load_state_dict (:136).

    Returns the updated controlnet params dict (input is not mutated).
    """
    import jax

    flat_dm = jax.tree_util.tree_flatten_with_path(diffusion_params)[0]
    dm_map = {jax.tree_util.keystr(path): leaf for path, leaf in flat_dm}

    copied, missing = [], []

    def _merge(params):
        flat_cn, treedef = jax.tree_util.tree_flatten_with_path(params)
        new_leaves = []
        for path, leaf in flat_cn:
            key = jax.tree_util.keystr(path)
            src = dm_map.get(key)
            if src is not None and src.shape == leaf.shape:
                new_leaves.append(src)
                copied.append(key)
            else:
                new_leaves.append(leaf)
                missing.append(key)
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    result = _merge(controlnet_params)
    if verbose:
        print(
            f"Copied weights from {len(copied)} keys of the diffusion model into the "
            f"ControlNet. ControlNet-only keys: {len(missing)}"
        )
    return result
