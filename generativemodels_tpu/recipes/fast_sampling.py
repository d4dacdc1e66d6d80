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

    # scan over groups of `refresh_every` steps: the scan body contains one
    # full forward + (k-1) cached forwards, so the compiled program stays
    # small (a fully unrolled trajectory schedules poorly at 3D scale)
    k = refresh_every
    n_groups = len(timesteps) // k
    grouped = jnp.asarray(timesteps[: n_groups * k]).reshape(n_groups, k)
    remainder = [int(t) for t in timesteps[n_groups * k :]]

    @jax.jit
    def run(image, key):
        def group_body(carry, ts_group):
            image, kkey = carry
            kkey, sub = jax.random.split(kkey)
            pred, cache = eval_full(image, ts_group[0])
            image = do_step(pred, ts_group[0], image, sub)
            for j in range(1, k):
                kkey, sub = jax.random.split(kkey)
                pred = eval_cached(image, ts_group[j], cache)
                image = do_step(pred, ts_group[j], image, sub)
            return (image, kkey), None

        (image, key), _ = jax.lax.scan(group_body, (image, key), grouped)
        for t in remainder:
            key, sub = jax.random.split(key)
            pred, _ = eval_full(image, jnp.asarray(t))
            image = do_step(pred, jnp.asarray(t), image, sub)
        return image

    return run(input_noise, key)
