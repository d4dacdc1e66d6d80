"""Spectral (Jukebox) loss: MSE between FFT amplitude spectra.

Reference parity: generative/losses/spectral_loss.py:21-87 (JukeboxLoss,
fftn over channel+spatial dims with "ortho" norm by default).
"""
from __future__ import annotations

import jax.numpy as jnp


class JukeboxLoss:
    """MSE between |FFT(input)| and |FFT(target)| over channel+spatial axes."""

    def __init__(
        self,
        spatial_dims: int,
        fft_signal_size: tuple[int, ...] | None = None,
        fft_norm: str = "ortho",
        reduction: str = "mean",
    ) -> None:
        if reduction not in ("none", "mean", "sum"):
            raise ValueError("reduction must be one of 'none', 'mean', 'sum'")
        self.spatial_dims = spatial_dims
        self.fft_signal_size = fft_signal_size
        self.fft_dim = tuple(range(1, spatial_dims + 2))
        self.fft_norm = fft_norm
        self.reduction = reduction

    def _amplitude(self, images: jnp.ndarray) -> jnp.ndarray:
        img_fft = jnp.fft.fftn(
            images, s=self.fft_signal_size, axes=self.fft_dim, norm=self.fft_norm
        )
        return jnp.sqrt(jnp.real(img_fft) ** 2 + jnp.imag(img_fft) ** 2)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        loss = (self._amplitude(input) - self._amplitude(target)) ** 2
        if self.reduction == "mean":
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss
