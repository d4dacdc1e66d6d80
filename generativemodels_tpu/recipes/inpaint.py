"""RePaint-style inpainting.

Reference parity: tutorials/generative/2d_ddpm/2d_ddpm_inpainting.py
(:299-320): per-timestep resampling that mixes the known region
(forward-noised from the original) with the generated region, with U inner
resample loops per timestep. The whole schedule compiles into nested
`lax.scan`s.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def inpaint(
    model_fn,
    scheduler,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array | None = None,
    num_resample_steps: int = 4,
):
    """Inpaint the masked region of `image` (mask==1 -> region to generate).

    Args:
        model_fn: `(x, timesteps) -> epsilon prediction`.
        scheduler: DDPMScheduler with timesteps set.
        image: original image (B, C, *spatial).
        mask: 1 where content must be generated, 0 where known.
        num_resample_steps: RePaint inner resampling iterations.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    timesteps = jnp.asarray(scheduler.timesteps)

    def outer(carry, t):
        x, k = carry

        def inner(carry, _):
            x, k = carry
            k, k_known, k_step, k_renoise = jax.random.split(k, 4)
            # known region: forward-noise the original to t
            noise = jax.random.normal(k_known, image.shape, image.dtype)
            tt = jnp.full(image.shape[:1], t)
            x_known = scheduler.add_noise(image, noise, tt)
            # unknown region: one reverse step from the current sample
            pred = model_fn(x, tt)
            x_unknown, _ = scheduler.step(pred, t, x, key=k_step)
            x_next = x_known * (1.0 - mask) + x_unknown * mask
            # re-noise back to t for the next resample iteration
            beta_t = jnp.take(scheduler.betas, t)
            renoise = jax.random.normal(k_renoise, image.shape, image.dtype)
            x_back = jnp.sqrt(1.0 - beta_t) * x_next + jnp.sqrt(beta_t) * renoise
            return (x_back, k), x_next

        (_, k), xs = jax.lax.scan(inner, (x, k), jnp.arange(num_resample_steps))
        # keep the last resample's combined sample (not re-noised)
        return (xs[-1], k), None

    x0 = jax.random.normal(key, image.shape, image.dtype)
    key, sub = jax.random.split(key)
    (x, _), _ = jax.lax.scan(outer, (x0, sub), timesteps)
    return x
