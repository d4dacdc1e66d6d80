"""Classifier-guided sampling / anomaly detection (Wolleb et al.).

Reference parity: the anomaly-detection recipe family built on
DiffusionModelEncoder (reference diffusion_model_unet.py:1946: a
noise-level-aware classifier): during the reverse loop the model's epsilon
is shifted by the gradient of the classifier's log-probability for the
target class, steering generation towards it (e.g. towards "healthy", so
|x - x_guided| highlights pathology).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..networks.schedulers import DDPMScheduler


def classifier_grad(classifier_fn, x, timesteps, target_class):
    """d log p(y=target | x, t) / dx for a logits-producing classifier."""

    def log_prob(x):
        logits = classifier_fn(x, timesteps)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(jnp.take_along_axis(logp, target_class[:, None], axis=1))

    return jax.grad(log_prob)(x)


def sample_with_classifier_guidance(
    model_fn,
    classifier_fn,
    scheduler,
    input_noise: jnp.ndarray,
    target_class: jnp.ndarray,
    guidance_scale: float = 1.0,
    key: jax.Array | None = None,
    eta: float = 0.0,
):
    """Reverse diffusion with classifier-gradient epsilon shifting.

    Args:
        model_fn: `(x, timesteps) -> epsilon` diffusion model.
        classifier_fn: `(x, timesteps) -> logits (B, num_classes)` — e.g.
            a DiffusionModelEncoder trained on noised inputs.
        scheduler: scheduler with timesteps set (epsilon prediction).
        input_noise: (B, C, *spatial) starting noise.
        target_class: (B,) int class to steer towards.
        guidance_scale: gradient scale s.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    timesteps = jnp.asarray(scheduler.timesteps)
    is_ddpm = isinstance(scheduler, DDPMScheduler)

    def body(carry, t):
        image, k = carry
        k, sub = jax.random.split(k)
        tt = jnp.full(image.shape[:1], t)
        eps = model_fn(image, tt)
        grad = classifier_grad(classifier_fn, image, tt, target_class)
        # eps_hat = eps - s * sqrt(1 - abar_t) * grad log p(y|x_t)
        abar = jnp.take(scheduler.alphas_cumprod, t)
        eps = eps - guidance_scale * jnp.sqrt(1.0 - abar) * grad
        if is_ddpm:
            image, _ = scheduler.step(eps, t, image, key=sub)
        else:
            image, _ = scheduler.step(eps, t, image, eta=eta, key=sub if eta > 0 else None)
        return (image, k), None

    (image, _), _ = jax.lax.scan(body, (input_noise, key), timesteps)
    return image
