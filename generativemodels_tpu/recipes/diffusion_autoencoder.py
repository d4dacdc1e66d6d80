"""Diffusion autoencoder: a semantic encoder conditions the UNet.

Reference parity: tutorials/generative/2d_diffusion_autoencoder/
2d_diffusion_autoencoder_tutorial.py:173-197 — an external ResNet-style
semantic encoder maps the clean image to an embedding that conditions the
diffusion UNet through cross-attention; at inference, the embedding of an
input image steers its reconstruction/manipulation.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SemanticEncoder(nn.Module):
    """Small conv encoder producing a (B, 1, emb_dim) cross-attn context.

    Stands in for the tutorial's torchvision ResNet18 (whose pretrained
    weights cannot be downloaded in this environment); any
    `(B, C, *spatial) -> (B, 1, emb_dim)` callable works in its place.
    """

    emb_dim: int = 64
    widths: tuple = (32, 64, 128)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.ndim - 2
        perm = (0,) + tuple(range(2, 2 + n)) + (1,)
        h = jnp.transpose(x, perm)
        for i, w in enumerate(self.widths):
            h = nn.Conv(w, (3,) * n, (2,) * n, [(1, 1)] * n, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(8, w), dtype=self.dtype, name=f"norm{i}")(h)
            h = nn.silu(h)
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))  # global average pool
        h = nn.Dense(self.emb_dim, name="head")(h)
        return h[:, None, :]  # (B, 1, emb_dim) context sequence


def diffusion_autoencoder_loss(
    unet_apply,
    encoder_apply,
    scheduler,
    images: jnp.ndarray,
    key: jax.Array,
    num_train_timesteps: int = 1000,
):
    """One training loss evaluation: condition the UNet on the semantic code.

    Args:
        unet_apply: `(x, timesteps, context) -> prediction`.
        encoder_apply: `(images) -> (B, 1, emb_dim)` semantic embedding.
        scheduler: Scheduler with add_noise.
    """
    k_noise, k_t = jax.random.split(key)
    noise = jax.random.normal(k_noise, images.shape, images.dtype)
    timesteps = jax.random.randint(k_t, (images.shape[0],), 0, num_train_timesteps)
    context = encoder_apply(images)
    noisy = scheduler.add_noise(images, noise, timesteps)
    pred = unet_apply(noisy, timesteps, context)
    return jnp.mean((pred - noise) ** 2)


def reconstruct(
    unet_apply,
    encoder_apply,
    scheduler,
    images: jnp.ndarray,
    key: jax.Array | None = None,
):
    """Encode an image semantically and regenerate it from noise."""
    if key is None:
        key = jax.random.PRNGKey(0)
    context = encoder_apply(images)
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, images.shape, images.dtype)
    timesteps = jnp.asarray(scheduler.timesteps)

    def body(carry, t):
        x, k = carry
        k, sub = jax.random.split(k)
        pred = unet_apply(x, jnp.full(images.shape[:1], t), context)
        from ..networks.schedulers import DDPMScheduler

        if isinstance(scheduler, DDPMScheduler):
            x, _ = scheduler.step(pred, t, x, key=sub)
        else:
            x, _ = scheduler.step(pred, t, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x, k_loop), timesteps)
    return x
