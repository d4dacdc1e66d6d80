"""Sinusoidal timestep embeddings.

Reference parity: generative/networks/nets/diffusion_model_unet.py:461-485
(get_timestep_embedding — DDPM-style, cos-first concatenation).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def get_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal embeddings of (N,) integer timesteps -> (N, embedding_dim).

    Matches the reference layout: [cos(args), sin(args)] with frequencies
    exp(-log(max_period) * i / half_dim), zero-padded when dim is odd.
    """
    if timesteps.ndim != 1:
        raise ValueError("Timesteps should be a 1d-array")

    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    freqs = jnp.exp(exponent / half_dim)

    args = timesteps[:, None].astype(jnp.float32) * freqs[None, :]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)

    if embedding_dim % 2 == 1:
        embedding = jnp.pad(embedding, ((0, 0), (0, 1)))
    return embedding
