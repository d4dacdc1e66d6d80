"""Decoder-only (autoregressive) transformer.

Reference parity: generative/networks/nets/transformer.py:22-106
(DecoderOnlyTransformer with AbsolutePositionalEmbedding; causal
TransformerBlocks with optional cross-attention; linear logits head).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..blocks.selfattention import TransformerBlock

__all__ = ["DecoderOnlyTransformer"]


class DecoderOnlyTransformer(nn.Module):
    """GPT-style AR model over token sequences (B, S) -> logits (B, S, V)."""

    num_tokens: int
    max_seq_len: int
    attn_layers_dim: int
    attn_layers_depth: int
    attn_layers_heads: int
    with_cross_attention: bool = False
    embedding_dropout_rate: float = 0.0
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
        seq_len = x.shape[1]
        tok_emb = nn.Embed(self.num_tokens, self.attn_layers_dim, name="token_embeddings")(x)
        if decode:
            # KV-cache decoding: x is (B, 1); position = decode step counter
            pos_index = self.variable(
                "cache", "pos_index", lambda: jnp.asarray(0, jnp.int32)
            )
            pos = pos_index.value[None, None]
            pos_index.value = pos_index.value + 1
        else:
            pos = jnp.arange(seq_len)[None, :]
        pos_emb = nn.Embed(
            self.max_seq_len, self.attn_layers_dim, name="position_embeddings"
        )(pos)
        h = tok_emb + pos_emb
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = nn.Dropout(self.embedding_dropout_rate)(h, deterministic=deterministic)

        for i in range(self.attn_layers_depth):
            h = TransformerBlock(
                hidden_size=self.attn_layers_dim,
                mlp_dim=self.attn_layers_dim * 4,
                num_heads=self.attn_layers_heads,
                dropout_rate=0.0,
                qkv_bias=False,
                causal=True,
                sequence_length=self.max_seq_len,
                with_cross_attention=self.with_cross_attention,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, context=context, deterministic=deterministic, decode=decode)

        return nn.Dense(self.num_tokens, name="to_logits")(h.astype(jnp.float32))
