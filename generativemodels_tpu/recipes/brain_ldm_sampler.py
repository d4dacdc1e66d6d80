"""Conditioned brain-LDM sampling (model-zoo bundle equivalent).

Reference parity: model-zoo/models/brain_image_synthesis_latent_diffusion_model/
scripts/sampler.py:16-45 — sampling conditioned on scalar covariates
(gender, age, ventricular and brain volume) fed as a cross-attention
context vector; the latent is decoded by the 3D AEKL stage 1.

Usage (with the `brain_3d_ldm` preset):

    from generativemodels_tpu.config import load_preset
    parser = load_preset("brain_3d_ldm")
    ...init params...
    img = sample_brain_ldm(unet_fn, aekl_bound, parser.resolve("scheduler"),
                           latent_shape=(1, 3, 20, 28, 20),
                           gender=0.0, age=0.5,
                           ventricular_vol=0.2, brain_vol=0.6)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..inferers import LatentDiffusionInferer


def make_conditioning(
    gender: float, age: float, ventricular_vol: float, brain_vol: float, batch: int = 1
) -> jnp.ndarray:
    """Pack normalised covariates into a (B, 1, 4) cross-attention context."""
    vec = jnp.asarray([gender, age, ventricular_vol, brain_vol], jnp.float32)
    return jnp.broadcast_to(vec[None, None, :], (batch, 1, 4))


def sample_brain_ldm(
    diffusion_model,
    autoencoder_model,
    scheduler,
    latent_shape: tuple,
    gender: float = 0.0,
    age: float = 0.5,
    ventricular_vol: float = 0.5,
    brain_vol: float = 0.5,
    scale_factor: float = 1.0,
    num_inference_steps: int = 50,
    key: jax.Array | None = None,
):
    """Sample one (batch of) brain volume(s) conditioned on covariates.

    The bundle's UNet concatenates the conditioning into the input channels
    AND attends over it; here the packed covariates are passed as the
    cross-attention context (mode="crossattn"), matching the preset's
    `with_conditioning=True, cross_attention_dim=4`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    scheduler.set_timesteps(num_inference_steps)
    inferer = LatentDiffusionInferer(scheduler, scale_factor=scale_factor)

    k_noise, k_loop = jax.random.split(key)
    noise = jax.random.normal(k_noise, latent_shape)
    conditioning = make_conditioning(
        gender, age, ventricular_vol, brain_vol, batch=latent_shape[0]
    )
    return inferer.sample(
        noise, autoencoder_model, diffusion_model,
        conditioning=conditioning, key=k_loop,
    )
