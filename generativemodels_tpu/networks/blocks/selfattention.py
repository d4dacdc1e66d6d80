"""Self-attention block (ViT/GPT style), with causal and cross modes.

Reference parity: generative/networks/blocks/selfattention.py:29-148
(SABlock: q/k/v linears with optional bias, causal tril masking, optional
cross-attention where k/v come from a context sequence).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import dot_product_attention


class SABlock(nn.Module):
    """Multi-head (optionally causal / cross) attention over (B, S, C)."""

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    causal: bool = False
    sequence_length: int | None = None
    with_cross_attention: bool = False
    use_flash_attention: bool | None = None
    dtype: jnp.dtype | None = None

    def __post_init__(self):
        super().__post_init__()
        if not (0 <= self.dropout_rate <= 1):
            raise ValueError("dropout_rate should be between 0 and 1.")
        if self.hidden_size % self.num_heads != 0:
            raise ValueError("hidden size should be divisible by num_heads.")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
        decode: bool = False,
    ) -> jnp.ndarray:
        dense = lambda name: nn.Dense(
            self.hidden_size, use_bias=self.qkv_bias, dtype=self.dtype, name=name
        )
        q = dense("to_q")(x)
        kv = context if context is not None else x
        k = dense("to_k")(kv)
        v = dense("to_v")(kv)

        if decode:
            # KV-cache single-token decoding: x is (B, 1, C). The cache is a
            # flax 'cache' collection updated in place each step — the
            # reference re-runs the full window per token (SURVEY.md §3.5);
            # this is the O(S) fast path.
            if self.sequence_length is None:
                raise ValueError("sequence_length is required for decode mode")
            b = x.shape[0]
            cached_k = self.variable(
                "cache", "cached_key",
                lambda: jnp.zeros((b, self.sequence_length, self.hidden_size), k.dtype),
            )
            cached_v = self.variable(
                "cache", "cached_value",
                lambda: jnp.zeros((b, self.sequence_length, self.hidden_size), v.dtype),
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.asarray(0, jnp.int32)
            )
            idx = cache_index.value
            cached_k.value = jax.lax.dynamic_update_slice(cached_k.value, k, (0, idx, 0))
            cached_v.value = jax.lax.dynamic_update_slice(cached_v.value, v, (0, idx, 0))
            cache_index.value = idx + 1
            key_mask = (jnp.arange(self.sequence_length) <= idx)[None, None, :]
            y = dot_product_attention(
                q, cached_k.value, cached_v.value, self.num_heads,
                mask=key_mask, use_flash=False,
            )
        else:
            y = dot_product_attention(
                q,
                k,
                v,
                self.num_heads,
                causal=self.causal,
                use_flash=self.use_flash_attention,
            )
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(y)
        return nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block: x+attn(ln(x)); [x+xattn(ln(x),ctx)]; x+mlp(ln(x)).

    Reference parity: generative/networks/blocks/transformerblock.py:21-92.
    """

    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    causal: bool = False
    sequence_length: int | None = None
    with_cross_attention: bool = False
    use_flash_attention: bool | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray | None = None,
        deterministic: bool = True,
        decode: bool = False,
    ) -> jnp.ndarray:
        from .mlp import MLPBlock

        x = x + SABlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            qkv_bias=self.qkv_bias,
            causal=self.causal,
            sequence_length=self.sequence_length,
            use_flash_attention=self.use_flash_attention,
            dtype=self.dtype,
            name="attn",
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic=deterministic,
          decode=decode)
        if self.with_cross_attention:
            x = x + SABlock(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                qkv_bias=self.qkv_bias,
                with_cross_attention=True,
                causal=False,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype,
                name="cross_attn",
            )(
                nn.LayerNorm(dtype=self.dtype, name="norm2")(x),
                context=context,
                deterministic=deterministic,
            )
        x = x + MLPBlock(
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            act="GELU",
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="mlp",
        )(nn.LayerNorm(dtype=self.dtype, name="norm3")(x), deterministic=deterministic)
        return x
