"""Timestep-conditioned 2D/3D diffusion UNet, TPU-native (channels-last).

Reference parity: generative/networks/nets/diffusion_model_unet.py —
DiffusionModelUNet (:1646), DiffusionModelEncoder (:1946), ResnetBlock
(:589), Downsample/Upsample (:488/:534), Down/Attn/CrossAttn down blocks
(:699/:788/:894), mid blocks (:1013/:1077), up blocks (:1151/:1242/:1351),
factories (:1472-1643), get_timestep_embedding (:461).

TPU-first design choices:
  - channels-last internally; (B, C, *spatial) only at the public boundary.
  - attention via ops.dot_product_attention (Pallas flash path on TPU).
  - ControlNet residual hooks preserved (forward kwargs
    down_block_additional_residuals / mid_block_additional_residual).
  - `dtype` sets the computation dtype (bf16 mixed precision); params are
    always float32.
"""
from __future__ import annotations

import os
from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import get_timestep_embedding
from ...ops.fused_conv import fold_groupnorm_affine, fused_norm_silu_conv3d
from ..blocks.attention_blocks import AttentionBlock, SpatialTransformer
from ..blocks.convolutions import ConvND, avg_pool, upsample_nearest

__all__ = [
    "DiffusionModelUNet",
    "DiffusionModelEncoder",
    "ResnetBlock",
    "Downsample",
    "Upsample",
    "DownBlock",
    "MidBlock",
    "UpBlock",
    "get_down_block",
    "get_mid_block",
    "get_up_block",
]


def ensure_tuple_rep(v, n: int) -> tuple:
    if isinstance(v, (list, tuple)):
        if len(v) != n:
            raise ValueError(f"expected sequence of length {n}, got {len(v)}")
        return tuple(v)
    return (v,) * n


class Downsample(nn.Module):
    """Stride-2 conv (or avg-pool) downsampling; channels-last."""

    spatial_dims: int
    num_channels: int
    use_conv: bool
    out_channels: int | None = None
    padding: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.num_channels
        if x.shape[-1] != self.num_channels:
            raise ValueError(
                f"Input channels ({x.shape[-1]}) != expected ({self.num_channels})"
            )
        if self.use_conv:
            return ConvND(
                self.spatial_dims,
                out_channels,
                kernel_size=3,
                strides=2,
                padding=self.padding,
                dtype=self.dtype,
                name="op",
            )(x)
        if self.num_channels != out_channels:
            raise ValueError("num_channels and out_channels must be equal when use_conv=False")
        return avg_pool(x, 2)


class Upsample(nn.Module):
    """Nearest x2 upsample with optional 3x3 conv; channels-last."""

    spatial_dims: int
    num_channels: int
    use_conv: bool
    out_channels: int | None = None
    padding: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.num_channels:
            raise ValueError("Input channels should be equal to num_channels")
        if self.use_conv:
            # upsample fuses into the conv on the decomposed 3D path
            # (never materialises the 8x volume; _upsample_conv3d)
            return ConvND(
                self.spatial_dims,
                self.out_channels or self.num_channels,
                kernel_size=3,
                padding=self.padding,
                dtype=self.dtype,
                nearest_upsample=True,
                name="conv",
            )(x)
        return upsample_nearest(x, 2)


class _RawParams(nn.Module):
    """Declare a submodule's parameters without running its computation.

    Used by the fused-ResnetBlock path to create a parameter tree
    *identical* to the standard module path (same names, shapes and
    initialisers as nn.GroupNorm / nn.Dense / ConvND), so checkpoints are
    interchangeable between the two lowerings.
    """

    spec: tuple  # ((name, shape, init), ...) with init in {ones, zeros, lecun}

    @nn.compact
    def __call__(self):
        inits = {
            "ones": nn.initializers.ones,
            "zeros": nn.initializers.zeros,
            "lecun": nn.initializers.lecun_normal(),
        }
        return tuple(
            self.param(n, inits[i], tuple(s), jnp.float32) for n, s, i in self.spec
        )


def _fused_resblock_enabled() -> bool:
    """GMTPU_FUSED_RESBLOCK=1/always routes 3D interior ResnetBlocks
    through the fused Pallas kernel (ops/fused_conv.py). Off by default:
    the kernel targets the sampling loop; its backward falls back to an
    XLA recompute, so training keeps the standard path."""
    return os.environ.get("GMTPU_FUSED_RESBLOCK", "0") in ("1", "always")


class ResnetBlock(nn.Module):
    """GroupNorm+SiLU conv block with additive timestep conditioning.

    norm1 -> silu -> [up/down] -> conv1 -> (+ time proj) -> norm2 -> silu ->
    conv2(zero-init) -> + skip(x). The second conv is zero-initialised so a
    fresh block is the identity (reference :644).

    With GMTPU_FUSED_RESBLOCK=1 the 3D non-resampling case lowers through
    `ops.fused_conv.fused_norm_silu_conv3d`: each GN-apply/SiLU chain,
    the depth-tap conv accumulation and the bias/residual epilogue become
    one Pallas pass (parameter tree unchanged — see _RawParams).
    """

    spatial_dims: int
    in_channels: int
    temb_channels: int
    out_channels: int | None = None
    up: bool = False
    down: bool = False
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels

        if (
            self.spatial_dims == 3
            and not self.up
            and not self.down
            and _fused_resblock_enabled()
        ):
            return self._fused_call(x, emb, out_channels)

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype, name="norm1"
        )(x)
        h = nn.silu(h)

        up_fused = self.up  # h's upsample fuses into conv1 (channels-last tconv)
        if self.up:
            x = upsample_nearest(x, 2)
        elif self.down:
            x = avg_pool(x, 2)
            h = avg_pool(h, 2)

        h = ConvND(
            self.spatial_dims, out_channels, kernel_size=3, padding=1, dtype=self.dtype,
            nearest_upsample=up_fused, name="conv1"
        )(h)

        temb = nn.Dense(out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(emb))
        # broadcast (B, C) over spatial axes (channels-last)
        h = h + temb.reshape(temb.shape[0], *([1] * self.spatial_dims), out_channels)

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype, name="norm2"
        )(h)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims,
            out_channels,
            kernel_size=3,
            padding=1,
            zero_init=True,
            dtype=self.dtype,
            name="conv2",
        )(h)

        if out_channels == self.in_channels:
            skip = x
        else:
            skip = ConvND(
                self.spatial_dims,
                out_channels,
                kernel_size=1,
                dtype=self.dtype,
                name="skip_connection",
            )(x)
        return skip + h

    def _fused_call(self, x, emb, out_channels: int) -> jnp.ndarray:
        """3D inference lowering via the fused Pallas kernel (one HBM pass
        per GN/SiLU/conv chain). Same parameter tree as the module path."""
        cin = x.shape[-1]
        g = self.norm_num_groups
        interpret = jax.default_backend() != "tpu"
        dtype = self.dtype or x.dtype

        (g1s, g1b) = _RawParams(
            (("scale", (cin,), "ones"), ("bias", (cin,), "zeros")), name="norm1"
        )()
        (k1, b1) = _RawParams(
            (("kernel", (3, 3, 3, cin, out_channels), "lecun"),
             ("bias", (out_channels,), "zeros")), name="conv1"
        )()
        (tk, tb) = _RawParams(
            (("kernel", (emb.shape[-1], out_channels), "lecun"),
             ("bias", (out_channels,), "zeros")), name="time_emb_proj"
        )()
        (g2s, g2b) = _RawParams(
            (("scale", (out_channels,), "ones"),
             ("bias", (out_channels,), "zeros")), name="norm2"
        )()
        (k2, b2) = _RawParams(
            (("kernel", (3, 3, 3, out_channels, out_channels), "zeros"),
             ("bias", (out_channels,), "zeros")), name="conv2"
        )()

        x = x.astype(dtype)
        s1, t1 = fold_groupnorm_affine(x, g1s, g1b, g, self.norm_eps)
        h = fused_norm_silu_conv3d(
            x, k1.astype(dtype), s1, t1, bias=b1, interpret=interpret
        )

        temb = jnp.dot(nn.silu(emb.astype(jnp.float32)), tk) + tb  # (B, C)

        if out_channels == cin:
            skip = x
        else:
            skip = ConvND(
                self.spatial_dims, out_channels, kernel_size=1,
                dtype=self.dtype, name="skip_connection",
            )(x)

        s2, t2 = fold_groupnorm_affine(h, g2s, g2b, g, self.norm_eps, temb=temb)
        return fused_norm_silu_conv3d(
            h, k2.astype(dtype), s2, t2, bias=b2,
            residual=skip.astype(dtype), interpret=interpret,
        )


class DownBlock(nn.Module):
    """Down path stage: [resnet (+ attn | xattn)] x N, then downsampler."""

    spatial_dims: int
    in_channels: int
    out_channels: int
    temb_channels: int
    num_res_blocks: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    add_downsample: bool = True
    resblock_updown: bool = False
    downsample_padding: int = 1
    with_attn: bool = False
    with_cross_attn: bool = False
    num_head_channels: int = 1
    transformer_num_layers: int = 1
    cross_attention_dim: int | None = None
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    dropout_cattn: float = 0.0
    dtype: jnp.dtype | None = None

    num_resnets_in_skips = property(
        lambda self: self.num_res_blocks + (1 if self.add_downsample else 0)
    )

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        temb: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        output_states = []
        in_ch = self.in_channels
        for i in range(self.num_res_blocks):
            hidden_states = ResnetBlock(
                spatial_dims=self.spatial_dims,
                in_channels=in_ch if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(hidden_states, temb)
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
                    dropout=self.dropout_cattn,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(hidden_states, context=context, deterministic=deterministic)
            output_states.append(hidden_states)

        if self.add_downsample:
            if self.resblock_updown:
                hidden_states = ResnetBlock(
                    spatial_dims=self.spatial_dims,
                    in_channels=self.out_channels,
                    out_channels=self.out_channels,
                    temb_channels=self.temb_channels,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    down=True,
                    dtype=self.dtype,
                    name="downsampler",
                )(hidden_states, temb)
            else:
                hidden_states = Downsample(
                    spatial_dims=self.spatial_dims,
                    num_channels=self.out_channels,
                    use_conv=True,
                    out_channels=self.out_channels,
                    padding=self.downsample_padding,
                    dtype=self.dtype,
                    name="downsampler",
                )(hidden_states)
            output_states.append(hidden_states)

        return hidden_states, output_states


class MidBlock(nn.Module):
    """resnet -> (self- or cross-)attention -> resnet."""

    spatial_dims: int
    in_channels: int
    temb_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    with_conditioning: bool = False
    num_head_channels: int = 1
    transformer_num_layers: int = 1
    cross_attention_dim: int | None = None
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    dropout_cattn: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        temb: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        resnet = lambda name: ResnetBlock(
            spatial_dims=self.spatial_dims,
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            temb_channels=self.temb_channels,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            name=name,
        )
        hidden_states = resnet("resnet_1")(hidden_states, temb)
        if self.with_conditioning:
            hidden_states = SpatialTransformer(
                spatial_dims=self.spatial_dims,
                in_channels=self.in_channels,
                num_attention_heads=self.in_channels // self.num_head_channels,
                num_head_channels=self.num_head_channels,
                num_layers=self.transformer_num_layers,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                use_flash_attention=self.use_flash_attention,
                dropout=self.dropout_cattn,
                dtype=self.dtype,
                name="attention",
            )(hidden_states, context=context, deterministic=deterministic)
        else:
            hidden_states = AttentionBlock(
                spatial_dims=self.spatial_dims,
                num_channels=self.in_channels,
                num_head_channels=self.num_head_channels,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype,
                name="attention",
            )(hidden_states)
        hidden_states = resnet("resnet_2")(hidden_states, temb)
        return hidden_states


class UpBlock(nn.Module):
    """Up path stage: [cat skip, resnet (+ attn | xattn)] x N, then upsampler."""

    spatial_dims: int
    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
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
    dropout_cattn: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        res_hidden_states_list: list[jnp.ndarray],
        temb: jnp.ndarray,
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

            hidden_states = ResnetBlock(
                spatial_dims=self.spatial_dims,
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(hidden_states, temb)
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
                    dropout=self.dropout_cattn,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(hidden_states, context=context, deterministic=deterministic)

        if self.add_upsample:
            if self.resblock_updown:
                hidden_states = ResnetBlock(
                    spatial_dims=self.spatial_dims,
                    in_channels=self.out_channels,
                    out_channels=self.out_channels,
                    temb_channels=self.temb_channels,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    up=True,
                    dtype=self.dtype,
                    name="upsampler",
                )(hidden_states, temb)
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


def get_down_block(**kwargs) -> DownBlock:
    """Factory mirroring reference get_down_block (:1472)."""
    return DownBlock(**kwargs)


def get_mid_block(**kwargs) -> MidBlock:
    """Factory mirroring reference get_mid_block (:1537)."""
    return MidBlock(**kwargs)


def get_up_block(**kwargs) -> UpBlock:
    """Factory mirroring reference get_up_block (:1577)."""
    return UpBlock(**kwargs)


def _validate_unet_args(
    num_channels,
    attention_levels,
    norm_num_groups,
    num_head_channels,
    num_res_blocks,
    with_conditioning,
    cross_attention_dim,
):
    if with_conditioning and cross_attention_dim is None:
        raise ValueError(
            "DiffusionModelUNet expects dimension of the cross-attention conditioning "
            "(cross_attention_dim) when using with_conditioning."
        )
    if cross_attention_dim is not None and not with_conditioning:
        raise ValueError(
            "DiffusionModelUNet expects with_conditioning=True when specifying the "
            "cross_attention_dim."
        )
    if any((c % norm_num_groups) != 0 for c in num_channels):
        raise ValueError("all num_channels must be multiples of norm_num_groups")
    if len(num_channels) != len(attention_levels):
        raise ValueError("num_channels must have the same length as attention_levels")
    if len(num_head_channels) != len(attention_levels):
        raise ValueError("num_head_channels must have the same length as attention_levels")
    if len(num_res_blocks) != len(num_channels):
        raise ValueError("num_res_blocks must have the same length as num_channels")


class DiffusionModelUNet(nn.Module):
    """UNet with timestep embedding and attention/cross-attention conditioning.

    Public forward contract matches the reference (:1869):
    ``apply(params, x, timesteps, context, class_labels,
    down_block_additional_residuals, mid_block_additional_residual)`` with
    x in (B, C, *spatial) layout.

    Args mirror the reference constructor (:1673); `dtype` additionally
    selects the computation precision (e.g. jnp.bfloat16).
    """

    spatial_dims: int
    in_channels: int
    out_channels: int
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
    dropout_cattn: float = 0.0
    # bool (reference parity: remat every block) or a per-level sequence —
    # e.g. (True, False, False) remats only the level-0 blocks (largest
    # activations, fewest FLOPs to recompute) while the deeper levels keep
    # their activations resident; the mid block follows the last entry.
    use_checkpointing: bool | Sequence[bool] = False
    dtype: jnp.dtype | None = None

    def _config(self):
        num_channels = tuple(self.num_channels)
        attention_levels = tuple(self.attention_levels)
        head_channels = ensure_tuple_rep(self.num_head_channels, len(attention_levels))
        res_blocks = ensure_tuple_rep(self.num_res_blocks, len(num_channels))
        if not (0.0 <= self.dropout_cattn <= 1.0):
            raise ValueError("Dropout cannot be negative or >1.0!")
        _validate_unet_args(
            num_channels,
            attention_levels,
            self.norm_num_groups,
            head_channels,
            res_blocks,
            self.with_conditioning,
            self.cross_attention_dim,
        )
        return num_channels, attention_levels, head_channels, res_blocks

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray | None = None,
        class_labels: jnp.ndarray | None = None,
        down_block_additional_residuals: Sequence[jnp.ndarray] | None = None,
        mid_block_additional_residual: jnp.ndarray | None = None,
        deterministic: bool = True,
        cached_down=None,
        return_down: bool = False,
    ) -> jnp.ndarray:
        """Forward pass; see class docstring.

        `cached_down` / `return_down` implement encoder(down-path) feature
        reuse across adjacent sampling timesteps ("Faster Diffusion" /
        block caching, PAPERS.md): with `return_down=True` the call also
        returns `(h_mid, down_block_res_samples)` (channels-last internals);
        passing that tuple back as `cached_down` skips the down path —
        an approximation, since the cached features embed the timestep
        they were computed at.
        """
        num_channels, attention_levels, head_channels, res_blocks = self._config()
        if context is not None and not self.with_conditioning:
            raise ValueError("model should have with_conditioning = True if context is provided")

        # public NC* layout -> channels-last
        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        h = jnp.transpose(x, perm)
        if self.dtype is not None:
            h = h.astype(self.dtype)

        # 1. time embedding
        time_embed_dim = num_channels[0] * 4
        t_emb = get_timestep_embedding(timesteps, num_channels[0])
        t_emb = t_emb.astype(h.dtype)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        # 2. class embedding
        if self.num_class_embeds is not None:
            if class_labels is None:
                raise ValueError("class_labels should be provided when num_class_embeds > 0")
            class_emb = nn.Embed(
                self.num_class_embeds, time_embed_dim, name="class_embedding"
            )(class_labels)
            emb = emb + class_emb.astype(h.dtype)

        # 3. initial convolution
        h = ConvND(
            self.spatial_dims, num_channels[0], kernel_size=3, padding=1, dtype=self.dtype,
            name="conv_in",
        )(h)

        # rematerialise block activations when training 3D volumes
        # (reference use_checkpointing, autoencoderkl.py:726-727). A
        # per-level sequence remats selectively: the profile
        # (benchmarks/results_3d_train_hlo.json) shows ~59% of the 3D
        # train step is 32k-seq attention custom calls, and whole-model
        # remat re-runs each attention forward inside the backward pass —
        # exempting the (small-activation) attention level recovers that
        # recompute for a few hundred MB of residency.
        ckpt = self.use_checkpointing
        if isinstance(ckpt, bool):
            ckpt = (ckpt,) * len(num_channels)
        else:
            ckpt = tuple(bool(c) for c in ckpt)
            if len(ckpt) != len(num_channels):
                raise ValueError(
                    "use_checkpointing sequence must have one entry per level: "
                    f"got {len(ckpt)} for {len(num_channels)} levels"
                )
        down_cls = lambda i: nn.remat(DownBlock, static_argnums=(3,)) if ckpt[i] else DownBlock
        mid_cls = nn.remat(MidBlock, static_argnums=(3,)) if ckpt[-1] else MidBlock
        up_cls = lambda i: nn.remat(UpBlock, static_argnums=(4,)) if ckpt[i] else UpBlock

        # 4. down path (skipped when cached features are supplied; module
        # names are explicit, so parameter paths stay stable either way)
        if cached_down is not None:
            h, cached_res = cached_down
            down_block_res_samples = list(cached_res)
        else:
            down_block_res_samples = [h]
            output_channel = num_channels[0]
            for i in range(len(num_channels)):
                input_channel = output_channel
                output_channel = num_channels[i]
                is_final_block = i == len(num_channels) - 1
                h, res_samples = down_cls(i)(
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
                    dropout_cattn=self.dropout_cattn,
                    dtype=self.dtype,
                    name=f"down_{i}",
                )(h, emb, context, deterministic)
                down_block_res_samples.extend(res_samples)
        down_cache = (h, tuple(down_block_res_samples))

        # ControlNet residual injection (channels-first residuals at the API)
        if down_block_additional_residuals is not None:
            down_block_res_samples = [
                s + jnp.transpose(r, perm).astype(s.dtype)
                for s, r in zip(down_block_res_samples, down_block_additional_residuals)
            ]

        # 5. mid
        h = mid_cls(
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
            dropout_cattn=self.dropout_cattn,
            dtype=self.dtype,
            name="middle_block",
        )(h, emb, context, deterministic)

        if mid_block_additional_residual is not None:
            h = h + jnp.transpose(mid_block_additional_residual, perm).astype(h.dtype)

        # 6. up path
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

            h = up_cls(len(num_channels) - 1 - i)(
                spatial_dims=self.spatial_dims,
                in_channels=input_channel,
                prev_output_channel=prev_output_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
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
                dropout_cattn=self.dropout_cattn,
                dtype=self.dtype,
                name=f"up_{i}",
            )(h, res_samples, emb, context, deterministic)

        # 7. output head (zero-init conv)
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype,
            name="out_norm",
        )(h)
        h = nn.silu(h)
        h = ConvND(
            self.spatial_dims,
            self.out_channels,
            kernel_size=3,
            padding=1,
            zero_init=True,
            dtype=self.dtype,
            name="out_conv",
        )(h)

        # back to public NC* layout, in float32
        inv_perm = (0, self.spatial_dims + 1) + tuple(range(1, self.spatial_dims + 1))
        out = jnp.transpose(h, inv_perm).astype(jnp.float32)
        if return_down:
            return out, down_cache
        return out


class DiffusionModelEncoder(nn.Module):
    """Down-path encoder + linear head for diffusion-time classification.

    Reference parity: diffusion_model_unet.py:1946-2115 (note the reference
    hard-codes nn.Linear(4096, 512); here the flatten width is inferred).
    Every level downsamples (the reference's `is_final_block` comparison at
    :2049 never fires, mirrored here).
    """

    spatial_dims: int
    in_channels: int
    out_channels: int
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
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray | None = None,
        class_labels: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        num_channels = tuple(self.num_channels)
        attention_levels = tuple(self.attention_levels)
        head_channels = ensure_tuple_rep(self.num_head_channels, len(attention_levels))
        res_blocks = ensure_tuple_rep(self.num_res_blocks, len(num_channels))
        _validate_unet_args(
            num_channels,
            attention_levels,
            self.norm_num_groups,
            head_channels,
            res_blocks,
            self.with_conditioning,
            self.cross_attention_dim,
        )
        if context is not None and not self.with_conditioning:
            raise ValueError("model should have with_conditioning = True if context is provided")

        perm = (0,) + tuple(range(2, 2 + self.spatial_dims)) + (1,)
        h = jnp.transpose(x, perm)
        if self.dtype is not None:
            h = h.astype(self.dtype)

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

        output_channel = num_channels[0]
        for i in range(len(num_channels)):
            input_channel = output_channel
            output_channel = num_channels[i]
            h, _ = DownBlock(
                spatial_dims=self.spatial_dims,
                in_channels=input_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
                num_res_blocks=res_blocks[i],
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                add_downsample=True,
                resblock_updown=self.resblock_updown,
                with_attn=attention_levels[i] and not self.with_conditioning,
                with_cross_attn=attention_levels[i] and self.with_conditioning,
                num_head_channels=head_channels[i],
                transformer_num_layers=self.transformer_num_layers,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                dtype=self.dtype,
                name=f"down_{i}",
            )(h, emb, context=context, deterministic=deterministic)

        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        h = nn.Dense(512, name="out_0")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        return nn.Dense(self.out_channels, name="out_3")(h)
