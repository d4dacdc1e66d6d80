"""Accelerated DDIM sampling via encoder (down-path) feature reuse.

Implements the block-caching / encoder-reuse acceleration (see PAPERS.md:
"Faster Diffusion: Rethinking the Role of the Encoder", "Cache Me if You
Can"): the UNet's down-path features change slowly across adjacent
timesteps, so they are recomputed only every `refresh_every` steps and
reused in between — the per-step cost drops to mid+up only. This is an
approximation; `refresh_every=1` is exact and matches the plain sampler.

Requires a model callable supporting the `cached_down` / `return_down`
kwargs (DiffusionModelUNet provides them).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..networks.schedulers import DDPMScheduler


def sample_with_encoder_reuse(
    model_fn,
    scheduler,
    input_noise: jnp.ndarray,
    refresh_every: int = 3,
    conditioning: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    eta: float = 0.0,
):
    """Reverse-diffusion sampling with down-path feature caching.

    Args:
        model_fn: `(x, timesteps, context=..., cached_down=..., return_down=...)`
            — e.g. a partial of DiffusionModelUNet.apply.
        scheduler: scheduler with timesteps set (DDIM recommended).
        input_noise: (B, C, *spatial).
        refresh_every: recompute the down path every k steps (1 = exact).

    Returns:
        The sampled image batch.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    timesteps = scheduler.timesteps
    is_ddpm = isinstance(scheduler, DDPMScheduler)

    def eval_full(image, t):
        tt = jnp.full(image.shape[:1], t)
        return model_fn(image, tt, context=conditioning, return_down=True)

    def eval_cached(image, t, cache):
        tt = jnp.full(image.shape[:1], t)
        return model_fn(image, tt, context=conditioning, cached_down=cache)

    def do_step(pred, t, image, k):
        if is_ddpm:
            return scheduler.step(pred, t, image, key=k)[0]
        return scheduler.step(pred, t, image, eta=eta, key=k if eta > 0 else None)[0]

    @jax.jit
    def run(image, key):
        # unrolled inside one jit: refresh points do a full forward, the
        # steps in between reuse the cached down features
        cache = None
        for i, t in enumerate(timesteps):
            key, sub = jax.random.split(key)
            t = jnp.asarray(int(t))
            if i % refresh_every == 0:
                pred, cache = eval_full(image, t)
            else:
                pred = eval_cached(image, t, cache)
            image = do_step(pred, t, image, sub)
        return image

    return run(input_noise, key)
