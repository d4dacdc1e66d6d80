"""Classifier-free guidance sampling.

Reference parity: tutorials/generative/classifier_free_guidance/
2d_ddpm_classifier_free_guidance_tutorial.py — train with an
unconditional class drawn with some probability (:110-115), sample with
batch doubling and `uncond + g * (cond - uncond)` (:297-312). Here the
guided reverse loop compiles into one `lax.scan`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..networks.schedulers import DDPMScheduler


def drop_condition(condition: jnp.ndarray, uncond_value, prob: float, key: jax.Array):
    """Replace each batch element's condition by `uncond_value` w.p. `prob`.

    The reference trains CFG by substituting class -1 with 15% probability.
    """
    mask = jax.random.bernoulli(key, prob, (condition.shape[0],))
    mask = mask.reshape((-1,) + (1,) * (condition.ndim - 1))
    return jnp.where(mask, jnp.asarray(uncond_value, condition.dtype), condition)


def sample_with_guidance(
    model_fn,
    scheduler,
    input_noise: jnp.ndarray,
    conditioning: jnp.ndarray,
    unconditioning: jnp.ndarray,
    guidance_scale: float = 7.0,
    key: jax.Array | None = None,
    eta: float = 0.0,
):
    """Reverse diffusion with classifier-free guidance (batch doubling).

    Args:
        model_fn: `(x, timesteps, context) -> prediction`.
        scheduler: DDPM or DDIM scheduler with timesteps set.
        input_noise: (B, C, *spatial) starting noise.
        conditioning / unconditioning: context for the conditional and
            unconditional halves, shape (B, S, D) (or class labels (B,)).
        guidance_scale: g in `uncond + g * (cond - uncond)`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    timesteps = jnp.asarray(scheduler.timesteps)
    is_ddpm = isinstance(scheduler, DDPMScheduler)
    # stateful fast solvers (DPM-Solver++, PNDM) thread an explicit state
    # pytree through the scan — guided CFG composes with them for free,
    # e.g. 10-step DPM-Solver++ CFG sampling
    is_stateful = hasattr(scheduler, "init_state")

    def guided_eval(image, t):
        doubled = jnp.concatenate([image, image], axis=0)
        tt = jnp.full((doubled.shape[0],), t)
        context = jnp.concatenate([conditioning, unconditioning], axis=0)
        pred = model_fn(doubled, tt, context)
        cond_pred, uncond_pred = jnp.split(pred, 2, axis=0)
        return uncond_pred + guidance_scale * (cond_pred - uncond_pred)

    def body(carry, t):
        if is_stateful:
            image, state = carry
            image, state = scheduler.step(state, guided_eval(image, t), t, image)
            return (image, state), None
        image, k = carry
        k, sub = jax.random.split(k)
        guided = guided_eval(image, t)
        if is_ddpm:
            image, _ = scheduler.step(guided, t, image, key=sub)
        else:
            image, _ = scheduler.step(guided, t, image, eta=eta, key=sub if eta > 0 else None)
        return (image, k), None

    if is_stateful:
        init = (input_noise, scheduler.init_state(input_noise.shape, input_noise.dtype, key=key))
    else:
        init = (input_noise, key)
    (image, *_), _ = jax.lax.scan(body, init, timesteps)
    return image
