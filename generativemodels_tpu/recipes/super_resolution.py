"""Stable-diffusion-upscaler style super-resolution helpers.

Reference parity: tutorials/generative/2d_super_resolution/
2d_stable_diffusion_v2_super_resolution.py:329-376 — noise-conditioning
augmentation: the low-res conditioning image is itself noised with a
second scheduler, concatenated into the model input channels, and the
noise level is fed through `class_labels`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def prepare_sr_batch(
    low_res: jnp.ndarray,
    low_res_scheduler,
    key: jax.Array,
    max_noise_level: int = 350,
):
    """Noise-augment the low-res conditioning for one training batch.

    Returns (noised_low_res, noise_level) where noise_level feeds the
    model's `class_labels`.
    """
    k_level, k_noise = jax.random.split(key)
    noise_level = jax.random.randint(k_level, (low_res.shape[0],), 0, max_noise_level)
    noise = jax.random.normal(k_noise, low_res.shape, low_res.dtype)
    noised = low_res_scheduler.add_noise(low_res, noise, noise_level)
    return noised, noise_level


def sample_super_resolution(
    model_fn,
    scheduler,
    low_res: jnp.ndarray,
    upscale_factor: int,
    noise_level: int = 20,
    key: jax.Array | None = None,
    low_res_scheduler=None,
):
    """Upscale `low_res` by sampling the SR diffusion model.

    Args:
        model_fn: `(x, timesteps, class_labels) -> prediction` where x is
            the concat of [noisy_high_res, noised_low_res_upsampled-channels].
        scheduler: sampling scheduler with timesteps set.
        low_res: (B, C, h, w) conditioning image.
        upscale_factor: spatial upscale multiple.
        noise_level: conditioning-augmentation level used at sampling time.
        low_res_scheduler: scheduler used to noise the conditioning
            (defaults to `scheduler`).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    low_res_scheduler = low_res_scheduler or scheduler
    b, c = low_res.shape[:2]
    high_shape = (b, c) + tuple(s * upscale_factor for s in low_res.shape[2:])

    k_init, k_cond, k_loop = jax.random.split(key, 3)
    image = jax.random.normal(k_init, high_shape)

    # noise-augment the conditioning once, then upsample to target size
    levels = jnp.full((b,), noise_level)
    cond_noise = jax.random.normal(k_cond, low_res.shape)
    noised_low_res = low_res_scheduler.add_noise(low_res, cond_noise, levels)
    upsampled = jax.image.resize(noised_low_res, high_shape, method="nearest")

    timesteps = jnp.asarray(scheduler.timesteps)

    def body(carry, t):
        image, k = carry
        k, sub = jax.random.split(k)
        model_in = jnp.concatenate([image, upsampled], axis=1)
        pred = model_fn(model_in, jnp.full((b,), t), levels)
        image, _ = scheduler.step(pred, t, image, key=sub)
        return (image, k), None

    (image, _), _ = jax.lax.scan(body, (image, k_loop), timesteps)
    return image


def compute_scale_factor(latents: jnp.ndarray) -> jnp.ndarray:
    """LDM latent scale factor = 1 / std(z) of the first training batch.

    Reference parity: tutorials/generative/2d_ldm/2d_ldm_tutorial.py:324-334.
    """
    return 1.0 / jnp.std(latents)
