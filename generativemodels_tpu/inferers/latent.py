"""Latent diffusion inferer (stage-1 + diffusion model orchestration).

Reference parity: generative/inferers/inferer.py:324-562
(LatentDiffusionInferer: scale_factor, latent pad/crop adapters for
mismatched latent shapes, `quantized` flag for VQVAE latents, latent-space
likelihood with optional upsampling of KL maps).

The `autoencoder_model` argument is any object exposing
`encode_stage_2_inputs` / `decode_stage_2_outputs` — typically a flax
module bound to its variables via `module.bind(variables)`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..networks.nets.vqvae import VQVAE
from .inferer import DiffusionInferer


def _center_pad_or_crop(x: jnp.ndarray, spatial_shape) -> jnp.ndarray:
    """Symmetrically pad or center-crop (B, C, *spatial) to a spatial shape."""
    spatial_shape = tuple(spatial_shape)
    pads = [(0, 0), (0, 0)]
    slices = [slice(None), slice(None)]
    for cur, tgt in zip(x.shape[2:], spatial_shape):
        if tgt >= cur:
            lo = (tgt - cur) // 2
            pads.append((lo, tgt - cur - lo))
            slices.append(slice(None))
        else:
            lo = (cur - tgt) // 2
            pads.append((0, 0))
            slices.append(slice(lo, lo + tgt))
    x = x[tuple(slices)]
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


def _is_vqvae(model) -> bool:
    return isinstance(model, VQVAE) or getattr(model, "is_vqvae", False)


def _resize_spatial(x: jnp.ndarray, spatial_shape, method: str) -> jnp.ndarray:
    out_shape = x.shape[:2] + tuple(spatial_shape)
    jax_method = {"nearest": "nearest", "bilinear": "linear", "trilinear": "linear"}[method]
    return jax.image.resize(x, out_shape, method=jax_method)


class LatentDiffusionInferer(DiffusionInferer):
    """Wraps a stage-1 autoencoder around DiffusionInferer.

    Args:
        scheduler: diffusion scheduler for the latent space.
        scale_factor: multiplier applied to encoded latents (LDM convention:
            1/std of the first training batch's latents).
        ldm_latent_shape / autoencoder_latent_shape: spatial shapes used to
            pad latents up for the UNet and crop back for the decoder when
            the two disagree.
    """

    def __init__(
        self,
        scheduler,
        scale_factor: float = 1.0,
        ldm_latent_shape: list | None = None,
        autoencoder_latent_shape: list | None = None,
    ) -> None:
        super().__init__(scheduler=scheduler)
        self.scale_factor = scale_factor
        if (ldm_latent_shape is None) ^ (autoencoder_latent_shape is None):
            raise ValueError(
                "If ldm_latent_shape is None, autoencoder_latent_shape must be None and vice versa."
            )
        self.ldm_latent_shape = ldm_latent_shape
        self.autoencoder_latent_shape = autoencoder_latent_shape

    def _encode(self, autoencoder_model, inputs, quantized, key):
        kwargs = {}
        if _is_vqvae(autoencoder_model):
            kwargs["quantized"] = quantized
        elif key is not None:
            kwargs["key"] = key
        latent = autoencoder_model.encode_stage_2_inputs(inputs, **kwargs)
        latent = jax.lax.stop_gradient(latent) * self.scale_factor
        if self.ldm_latent_shape is not None:
            latent = _center_pad_or_crop(latent, self.ldm_latent_shape)
        return latent

    def _decode(self, autoencoder_model, latent, seg):
        if self.autoencoder_latent_shape is not None:
            latent = _center_pad_or_crop(latent, self.autoencoder_latent_shape)
        kwargs = {"seg": seg} if seg is not None and _takes_seg(autoencoder_model) else {}
        return autoencoder_model.decode_stage_2_outputs(latent / self.scale_factor, **kwargs)

    def __call__(
        self,
        inputs: jnp.ndarray,
        autoencoder_model,
        diffusion_model,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
        condition: jnp.ndarray | None = None,
        mode: str = "crossattn",
        seg: jnp.ndarray | None = None,
        quantized: bool = True,
        key: jax.Array | None = None,
    ) -> jnp.ndarray:
        latent = self._encode(autoencoder_model, inputs, quantized, key)
        return super().__call__(
            inputs=latent,
            diffusion_model=diffusion_model,
            noise=noise,
            timesteps=timesteps,
            condition=condition,
            mode=mode,
            seg=seg,
        )

    def sample(
        self,
        input_noise: jnp.ndarray,
        autoencoder_model,
        diffusion_model,
        scheduler=None,
        save_intermediates: bool = False,
        intermediate_steps: int = 100,
        conditioning: jnp.ndarray | None = None,
        mode: str = "crossattn",
        verbose: bool = False,
        seg: jnp.ndarray | None = None,
        key: jax.Array | None = None,
        eta: float = 0.0,
    ):
        if (
            seg is not None
            and hasattr(autoencoder_model, "label_nc")
            and hasattr(diffusion_model, "label_nc")
            and autoencoder_model.label_nc != diffusion_model.label_nc
        ):
            raise ValueError(
                "If both autoencoder_model and diffusion_model implement SPADE, the number "
                "of semantic labels for each must be compatible."
            )

        outputs = super().sample(
            input_noise=input_noise,
            diffusion_model=diffusion_model,
            scheduler=scheduler,
            save_intermediates=save_intermediates,
            intermediate_steps=intermediate_steps,
            conditioning=conditioning,
            mode=mode,
            verbose=verbose,
            seg=seg,
            key=key,
            eta=eta,
        )
        if save_intermediates:
            latent, latent_intermediates = outputs
            image = self._decode(autoencoder_model, latent, seg)
            intermediates = [
                self._decode(autoencoder_model, li, seg) for li in latent_intermediates
            ]
            return image, intermediates
        return self._decode(autoencoder_model, outputs, seg)

    def get_likelihood(
        self,
        inputs: jnp.ndarray,
        autoencoder_model,
        diffusion_model,
        scheduler=None,
        save_intermediates: bool = False,
        conditioning: jnp.ndarray | None = None,
        mode: str = "crossattn",
        original_input_range: tuple = (0, 255),
        scaled_input_range: tuple = (0, 1),
        verbose: bool = False,
        resample_latent_likelihoods: bool = False,
        resample_interpolation_mode: str = "nearest",
        seg: jnp.ndarray | None = None,
        quantized: bool = True,
        key: jax.Array | None = None,
        noise: jnp.ndarray | None = None,
    ):
        if resample_latent_likelihoods and resample_interpolation_mode not in (
            "nearest",
            "bilinear",
            "trilinear",
        ):
            raise ValueError(
                "resample_interpolation mode should be either nearest, bilinear, or "
                f"trilinear, got {resample_interpolation_mode}"
            )
        latents = self._encode(autoencoder_model, inputs, quantized, None)
        outputs = super().get_likelihood(
            inputs=latents,
            diffusion_model=diffusion_model,
            scheduler=scheduler,
            save_intermediates=save_intermediates,
            conditioning=conditioning,
            mode=mode,
            original_input_range=original_input_range,
            scaled_input_range=scaled_input_range,
            verbose=verbose,
            seg=seg,
            key=key,
            noise=noise,
        )
        if save_intermediates and resample_latent_likelihoods:
            total, intermediates = outputs
            intermediates = [
                _resize_spatial(x, inputs.shape[2:], resample_interpolation_mode)
                for x in intermediates
            ]
            return total, intermediates
        return outputs


def _takes_seg(model) -> bool:
    return hasattr(model, "label_nc")
