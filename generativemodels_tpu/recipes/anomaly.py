"""Diffusion-based anomaly detection (DDIM encode -> decode -> error map).

Reference parity: the anomaly-detection recipe family (Wolleb et al.,
reference DDIMScheduler.reversed_step ddim.py:239-301 and the
distributed/anomaly tutorials): encode an image deterministically towards
noise for L steps, decode back, and read the reconstruction error as an
anomaly map; healthy structure survives the roundtrip, anomalies do not.
Both loops compile into single `lax.scan`s.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ddim_encode(model_fn, scheduler, image: jnp.ndarray, num_steps: int) -> jnp.ndarray:
    """Deterministically encode an image to x_t via DDIM reversed steps."""
    timesteps = jnp.asarray(scheduler.timesteps[::-1][:num_steps])  # ascending

    def body(x, t):
        pred = model_fn(x, jnp.full(x.shape[:1], t))
        x, _ = scheduler.reversed_step(pred, t, x)
        return x, None

    x, _ = jax.lax.scan(body, image, timesteps)
    return x


def ddim_decode(model_fn, scheduler, latent: jnp.ndarray, num_steps: int) -> jnp.ndarray:
    """Deterministic DDIM decoding from x_t back to image space.

    Mirrors `ddim_encode`: the first decode timestep is one stride above the
    last encode timestep, so encode(decode(x)) is the exact inverse
    trajectory (step at t consumes x_t and emits x_{t-delta}).
    """
    delta = scheduler.num_train_timesteps // scheduler.num_inference_steps
    ascending = jnp.asarray(scheduler.timesteps[::-1][:num_steps])
    timesteps = ascending[::-1] + delta

    def body(x, t):
        pred = model_fn(x, jnp.full(x.shape[:1], t))
        x, _ = scheduler.step(pred, t, x, eta=0.0)
        return x, None

    x, _ = jax.lax.scan(body, latent, timesteps)
    return x


def anomaly_map(
    model_fn, scheduler, image: jnp.ndarray, encode_steps: int = 250
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (reconstruction, |image - reconstruction| anomaly map).

    `scheduler` must be a DDIMScheduler with `set_timesteps` already called;
    `encode_steps` counts inference steps (not train timesteps).
    """
    latent = ddim_encode(model_fn, scheduler, image, encode_steps)
    recon = ddim_decode(model_fn, scheduler, latent, encode_steps)
    return recon, jnp.abs(image - recon)
