"""Attention blocks for diffusion nets (channels-last).

Reference parity: generative/networks/nets/diffusion_model_unet.py —
CrossAttention (:72), BasicTransformerBlock (:178), SpatialTransformer
(:237), AttentionBlock (:345). The xformers path is replaced by the Pallas
flash kernel via ops.dot_product_attention.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops import dot_product_attention
from .convolutions import ConvND
from .mlp import MLPBlock


class CrossAttention(nn.Module):
    """Multi-head (cross-)attention over (B, S, C) sequences.

    Self-attention when no context is given. q comes from x; k/v come from
    the context.
    """

    query_dim: int
    cross_attention_dim: int | None = None
    num_attention_heads: int = 8
    num_head_channels: int = 64
    dropout: float = 0.0
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        inner_dim = self.num_head_channels * self.num_attention_heads
        context = x if context is None else context

        dense = lambda name: nn.Dense(inner_dim, use_bias=False, dtype=self.dtype, name=name)
        q = dense("to_q")(x)
        k = dense("to_k")(context)
        v = dense("to_v")(context)

        out = dot_product_attention(
            q,
            k,
            v,
            self.num_attention_heads,
            scale=1.0 / (self.num_head_channels**0.5),
            upcast=self.upcast_attention,
            use_flash=self.use_flash_attention,
        )
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU MLP, each pre-LayerNormed + residual."""

    num_channels: int
    num_attention_heads: int
    num_head_channels: int
    dropout: float = 0.0
    cross_attention_dim: int | None = None
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn_kwargs = dict(
            query_dim=self.num_channels,
            num_attention_heads=self.num_attention_heads,
            num_head_channels=self.num_head_channels,
            dropout=self.dropout,
            upcast_attention=self.upcast_attention,
            use_flash_attention=self.use_flash_attention,
            dtype=self.dtype,
        )
        x = CrossAttention(name="attn1", **attn_kwargs)(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic=deterministic
        ) + x
        x = CrossAttention(
            name="attn2", cross_attention_dim=self.cross_attention_dim, **attn_kwargs
        )(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x),
            context=context,
            deterministic=deterministic,
        ) + x
        x = MLPBlock(
            hidden_size=self.num_channels,
            mlp_dim=self.num_channels * 4,
            act="GEGLU",
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="ff",
        )(nn.LayerNorm(dtype=self.dtype, name="norm3")(x), deterministic=deterministic) + x
        return x


class SpatialTransformer(nn.Module):
    """Transformer applied to flattened spatial maps (B, *spatial, C)."""

    spatial_dims: int
    in_channels: int
    num_attention_heads: int
    num_head_channels: int
    num_layers: int = 1
    dropout: float = 0.0
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    cross_attention_dim: int | None = None
    upcast_attention: bool = False
    use_flash_attention: bool | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        inner_dim = self.num_attention_heads * self.num_head_channels
        batch = x.shape[0]
        spatial_shape = x.shape[1:-1]

        residual = x
        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype, name="norm"
        )(x)
        h = ConvND(
            self.spatial_dims, inner_dim, kernel_size=1, dtype=self.dtype, name="proj_in"
        )(h)

        h = h.reshape(batch, -1, inner_dim)
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                num_channels=inner_dim,
                num_attention_heads=self.num_attention_heads,
                num_head_channels=self.num_head_channels,
                dropout=self.dropout,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, context=context, deterministic=deterministic)
        h = h.reshape(batch, *spatial_shape, inner_dim)

        h = ConvND(
            self.spatial_dims,
            self.in_channels,
            kernel_size=1,
            zero_init=True,
            dtype=self.dtype,
            name="proj_out",
        )(h)
        return h + residual


class AttentionBlock(nn.Module):
    """Spatial self-attention block: GroupNorm -> qkv attention -> residual.

    Reference-parity quirk: the reference defines a `proj_attn` output
    projection but never applies it in forward
    (diffusion_model_unet.py:419-460, autoencoderkl.py:268-312) — trained
    zoo checkpoints bake in that behavior, so the default here mirrors it
    (no output projection, and no dead parameter either).
    `apply_final_proj=True` opts into the corrected block with a real
    output projection (not loadable from reference checkpoints).
    """

    spatial_dims: int
    num_channels: int
    num_head_channels: int | None = None
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    use_flash_attention: bool | None = None
    apply_final_proj: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_heads = (
            self.num_channels // self.num_head_channels
            if self.num_head_channels is not None
            else 1
        )
        batch = x.shape[0]
        spatial_shape = x.shape[1:-1]

        h = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=self.norm_eps, dtype=self.dtype, name="norm"
        )(x)
        h = h.reshape(batch, -1, self.num_channels)

        q = nn.Dense(self.num_channels, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(self.num_channels, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(self.num_channels, dtype=self.dtype, name="to_v")(h)

        out = dot_product_attention(
            q,
            k,
            v,
            num_heads,
            scale=1.0 / ((self.num_channels / num_heads) ** 0.5),
            use_flash=self.use_flash_attention,
        )
        if self.apply_final_proj:
            out = nn.Dense(self.num_channels, dtype=self.dtype, name="proj_attn")(out)
        out = out.reshape(batch, *spatial_shape, self.num_channels)
        return out + x
