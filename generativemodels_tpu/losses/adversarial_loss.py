"""Patch adversarial loss (BCE / hinge / least-squares).

Reference parity: generative/losses/adversarial_loss.py:29-170
(PatchAdversarialLoss with criterion-specific activations, generator-mode
target forcing, hinge = -mean(min(+/-D - 1, 0)), and single or multi-scale
discriminator output lists).
"""
from __future__ import annotations

import warnings

import jax
import jax.nn
import jax.numpy as jnp

from ..utils import StrEnum


class AdversarialCriterions(StrEnum):
    BCE = "bce"
    HINGE = "hinge"
    LEAST_SQUARE = "least_squares"


class PatchAdversarialLoss:
    """Adversarial loss over raw (pre-activation) discriminator outputs.

    Args:
        reduction: "none" | "mean" | "sum" over the per-discriminator losses.
        criterion: "bce" | "hinge" | "least_squares".
        no_activation_leastsq: drop the leaky-relu pre-activation for LSGAN.
    """

    def __init__(
        self,
        reduction: str = "mean",
        criterion: str = AdversarialCriterions.LEAST_SQUARE.value,
        no_activation_leastsq: bool = False,
    ) -> None:
        if criterion.lower() not in [m.value for m in AdversarialCriterions]:
            raise ValueError(
                "Unrecognised criterion entered for Adversarial Loss. Must be one in: %s"
                % ", ".join([m.value for m in AdversarialCriterions])
            )
        if reduction not in ("none", "mean", "sum"):
            raise ValueError("reduction must be one of 'none', 'mean', 'sum'")

        self.real_label = 1.0
        self.fake_label = 0.0
        self.activation = None
        if criterion == AdversarialCriterions.BCE.value:
            self.activation = jax.nn.sigmoid
        elif criterion == AdversarialCriterions.HINGE.value:
            self.activation = jnp.tanh
            self.fake_label = -1.0
        elif criterion == AdversarialCriterions.LEAST_SQUARE.value:
            if not no_activation_leastsq:
                self.activation = lambda x: jax.nn.leaky_relu(x, 0.05)

        self.criterion = criterion
        self.reduction = reduction

    def get_target_tensor(self, input: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
        """Label tensor shaped like `input` (reference:
        generative/losses/adversarial_loss.py:80 — real/fake fill value
        broadcast to the discriminator output shape)."""
        filling = self.real_label if target_is_real else self.fake_label
        return jnp.full_like(input, filling)

    def get_zero_tensor(self, input: jnp.ndarray) -> jnp.ndarray:
        """Zeros shaped like `input` (reference: adversarial_loss.py:95)."""
        return jnp.zeros_like(input)

    def forward_single(self, input: jnp.ndarray, target: jnp.ndarray):
        """Criterion between one (activated) discriminator output and its
        target tensor (reference: adversarial_loss.py:160-170). For hinge,
        `target` is unused beyond shape — the reference passes the zero
        tensor and computes -mean(min(input - 1, 0))."""
        if self.criterion == AdversarialCriterions.BCE.value:
            p = jnp.clip(input, 1e-7, 1 - 1e-7)
            elems = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
        elif self.criterion == AdversarialCriterions.LEAST_SQUARE.value:
            elems = (input - target) ** 2
        elif self.criterion == AdversarialCriterions.HINGE.value:
            return -jnp.mean(jnp.minimum(input - 1.0, self.get_zero_tensor(input)))
        else:
            return None
        if self.reduction == "sum":
            return jnp.sum(elems)
        if self.reduction == "none":
            return elems
        return jnp.mean(elems)

    def _single(self, disc_out: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
        # Reference flow (adversarial_loss.py:132-158): activation, then
        # per-criterion target tensor, then forward_single — with the
        # hinge fake case sign-flipping the input. For bce/least_squares
        # `reduction` applies over ALL elements of each discriminator
        # output; hinge always takes the mean.
        if self.activation is not None:
            disc_out = self.activation(disc_out)
        if self.criterion == AdversarialCriterions.HINGE.value:
            target = self.get_zero_tensor(disc_out)
            if not target_is_real:
                disc_out = -disc_out
        else:
            target = self.get_target_tensor(disc_out, target_is_real)
        return self.forward_single(disc_out, target)

    def __call__(self, input, target_is_real: bool, for_discriminator: bool):
        """Compute the loss for one or several discriminator outputs.

        Args:
            input: raw discriminator prediction(s) — tensor or list of tensors.
            target_is_real: label for the batch (forced True for generators).
            for_discriminator: whether this loss optimises D (else G).
        """
        if not for_discriminator and not target_is_real:
            target_is_real = True
            warnings.warn(
                "Variable target_is_real has been set to False, but for_discriminator is set "
                "to False. To optimise a generator, target_is_real must be set to True."
            )

        if not isinstance(input, list):
            input = [input]
        losses = [self._single(jnp.asarray(d), target_is_real) for d in input]

        if self.reduction == "mean":
            return jnp.mean(jnp.stack(losses))
        if self.reduction == "sum":
            return jnp.sum(jnp.stack(losses))
        return losses


def feature_matching_loss(real_features, fake_features) -> jnp.ndarray:
    """Pix2PixHD feature-matching loss over discriminator intermediates.

    The reference's PatchDiscriminator returns all intermediate features
    precisely to enable this regulariser (patchgan_discriminator.py:269-283).
    Accepts per-discriminator lists (multi-scale) or flat feature lists;
    real features are treated as constants (stop_gradient).
    """
    if real_features and isinstance(real_features[0], (list, tuple)):
        pairs = [
            (r, f)
            for rs, fs in zip(real_features, fake_features)
            for r, f in zip(rs, fs)
        ]
    else:
        pairs = list(zip(real_features, fake_features))
    if not pairs:
        raise ValueError("feature_matching_loss needs at least one feature pair")
    losses = [
        jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f)) for r, f in pairs
    ]
    return jnp.mean(jnp.stack(losses))
