"""Transformer MLP block with GELU / GEGLU activations.

Provides the MONAI `MLPBlock` behavior used by the reference transformer
blocks (generative/networks/blocks/transformerblock.py:21-92 uses
MLPBlock(hidden_size, mlp_dim, act="GELU"); BasicTransformerBlock uses
act="GEGLU", diffusion_model_unet.py:211).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLPBlock(nn.Module):
    """Linear -> (GELU | GEGLU) -> Dropout -> Linear -> Dropout.

    For GEGLU the first projection doubles the width; half acts as the gate:
    out = x * gelu(gate).
    """

    hidden_size: int
    mlp_dim: int
    act: str = "GELU"
    dropout_rate: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = self.act.upper()
        if act == "GEGLU":
            h = nn.Dense(self.mlp_dim * 2, dtype=self.dtype, name="linear1")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate)
        elif act == "GELU":
            h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="linear1")(x)
            h = nn.gelu(h)
        else:
            raise ValueError(f"Unsupported MLP activation: {self.act}")
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="linear2")(h)
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
