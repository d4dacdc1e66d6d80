"""ControlNet-conditioned diffusion inferers.

Reference parity: generative/inferers/inferer.py:565-1123
(ControlNetDiffusionInferer and ControlNetLatentDiffusionInferer: every
model evaluation is preceded by a ControlNet forward whose residuals feed
the UNet; the latent variant auto-resizes cn_cond to the latent spatial
shape).

Implemented by wrapping the diffusion model callable: the wrapper runs the
ControlNet on the same (possibly concat-conditioned) input and passes its
residuals through the UNet's ControlNet hooks — so the scan-compiled
sampling/likelihood loops of the parent classes are reused unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .inferer import DiffusionInferer
from .latent import LatentDiffusionInferer


def _wrap_with_controlnet(diffusion_model, controlnet, cn_cond):
    def wrapped(x, timesteps, context=None, **kwargs):
        down_res, mid_res = controlnet(
            x, timesteps, controlnet_cond=cn_cond, context=context
        )
        return diffusion_model(
            x,
            timesteps,
            context=context,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
            **kwargs,
        )

    return wrapped


class ControlNetDiffusionInferer(DiffusionInferer):
    """DiffusionInferer with a ControlNet forward before every model eval."""

    def __call__(
        self,
        inputs: jnp.ndarray,
        diffusion_model,
        controlnet,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
        cn_cond: jnp.ndarray,
        condition: jnp.ndarray | None = None,
        mode: str = "crossattn",
        seg: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        return super().__call__(
            inputs=inputs,
            diffusion_model=_wrap_with_controlnet(diffusion_model, controlnet, cn_cond),
            noise=noise,
            timesteps=timesteps,
            condition=condition,
            mode=mode,
            seg=seg,
        )

    def sample(
        self,
        input_noise: jnp.ndarray,
        diffusion_model,
        controlnet,
        cn_cond: jnp.ndarray,
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
        return super().sample(
            input_noise=input_noise,
            diffusion_model=_wrap_with_controlnet(diffusion_model, controlnet, cn_cond),
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

    def get_likelihood(
        self,
        inputs: jnp.ndarray,
        diffusion_model,
        controlnet,
        cn_cond: jnp.ndarray,
        scheduler=None,
        save_intermediates: bool = False,
        conditioning: jnp.ndarray | None = None,
        mode: str = "crossattn",
        original_input_range: tuple = (0, 255),
        scaled_input_range: tuple = (0, 1),
        verbose: bool = False,
        seg: jnp.ndarray | None = None,
        key: jax.Array | None = None,
        noise: jnp.ndarray | None = None,
    ):
        return super().get_likelihood(
            inputs=inputs,
            diffusion_model=_wrap_with_controlnet(diffusion_model, controlnet, cn_cond),
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


class ControlNetLatentDiffusionInferer(LatentDiffusionInferer):
    """ControlNet + latent diffusion; cn_cond is resized to the latent shape."""

    @staticmethod
    def _fit_cn_cond(cn_cond: jnp.ndarray, latent_like: jnp.ndarray) -> jnp.ndarray:
        # torch F.interpolate(mode="nearest") convention (src = floor(dst *
        # in/out)) — the reference downscales cn_cond to the latent shape
        # this way (inferer.py:926-927) and jax.image.resize picks different
        # source pixels when downscaling
        for axis, out_s in enumerate(latent_like.shape[2:], start=2):
            in_s = cn_cond.shape[axis]
            if in_s == out_s:
                continue
            idx = jnp.floor(jnp.arange(out_s) * (in_s / out_s)).astype(jnp.int32)
            cn_cond = jnp.take(cn_cond, idx, axis=axis)
        return cn_cond

    def __call__(
        self,
        inputs: jnp.ndarray,
        autoencoder_model,
        diffusion_model,
        controlnet,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
        cn_cond: jnp.ndarray,
        condition: jnp.ndarray | None = None,
        mode: str = "crossattn",
        seg: jnp.ndarray | None = None,
        quantized: bool = True,
        key: jax.Array | None = None,
    ) -> jnp.ndarray:
        cn_cond = self._fit_cn_cond(cn_cond, noise)
        return super().__call__(
            inputs=inputs,
            autoencoder_model=autoencoder_model,
            diffusion_model=_wrap_with_controlnet(diffusion_model, controlnet, cn_cond),
            noise=noise,
            timesteps=timesteps,
            condition=condition,
            mode=mode,
            seg=seg,
            quantized=quantized,
            key=key,
        )

    def sample(
        self,
        input_noise: jnp.ndarray,
        autoencoder_model,
        diffusion_model,
        controlnet,
        cn_cond: jnp.ndarray,
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
        cn_cond = self._fit_cn_cond(cn_cond, input_noise)
        return super().sample(
            input_noise=input_noise,
            autoencoder_model=autoencoder_model,
            diffusion_model=_wrap_with_controlnet(diffusion_model, controlnet, cn_cond),
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

    def get_likelihood(
        self,
        inputs: jnp.ndarray,
        autoencoder_model,
        diffusion_model,
        controlnet,
        cn_cond: jnp.ndarray,
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
        latent_probe = autoencoder_model.encode_stage_2_inputs(
            inputs[:1], **({"quantized": quantized} if hasattr(inputs, "shape") and _is_vq(autoencoder_model) else {})
        )
        cn_cond = self._fit_cn_cond(cn_cond, latent_probe)
        return super().get_likelihood(
            inputs=inputs,
            autoencoder_model=autoencoder_model,
            diffusion_model=_wrap_with_controlnet(diffusion_model, controlnet, cn_cond),
            scheduler=scheduler,
            save_intermediates=save_intermediates,
            conditioning=conditioning,
            mode=mode,
            original_input_range=original_input_range,
            scaled_input_range=scaled_input_range,
            verbose=verbose,
            resample_latent_likelihoods=resample_latent_likelihoods,
            resample_interpolation_mode=resample_interpolation_mode,
            seg=seg,
            quantized=quantized,
            key=key,
            noise=noise,
        )


def _is_vq(model) -> bool:
    from ..networks.nets.vqvae import VQVAE

    return isinstance(model, VQVAE) or getattr(model, "is_vqvae", False)
