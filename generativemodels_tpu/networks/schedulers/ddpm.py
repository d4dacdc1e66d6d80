"""DDPM scheduler (Ho et al. 2020), JAX-native.

Reference parity: generative/networks/schedulers/ddpm.py:41-252
(DDPMScheduler with variance types fixed_small/fixed_large/learned/
learned_range and prediction types epsilon/sample/v_prediction).

All branches on config are Python-static; branches on the (possibly traced)
timestep use `jnp.where`, so `step` compiles cleanly inside `lax.scan`.
Noise is drawn from an explicit `jax.random` key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import StrEnum
from .scheduler import Scheduler, _reject_torch_generator


class DDPMVarianceType(StrEnum):
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED = "learned"
    LEARNED_RANGE = "learned_range"


class DDPMPredictionType(StrEnum):
    EPSILON = "epsilon"
    SAMPLE = "sample"
    V_PREDICTION = "v_prediction"


class DDPMScheduler(Scheduler):
    """Ancestral DDPM sampler.

    Args:
        num_train_timesteps: diffusion steps used at train time.
        schedule: NoiseSchedules member name.
        variance_type: member of DDPMVarianceType.
        clip_sample: clip predicted x0 into [clip_sample_min, clip_sample_max].
        prediction_type: member of DDPMPredictionType.
        schedule_args: forwarded to the schedule function.
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        schedule: str = "linear_beta",
        variance_type: str = DDPMVarianceType.FIXED_SMALL,
        clip_sample: bool = True,
        prediction_type: str = DDPMPredictionType.EPSILON,
        clip_sample_min: float = -1.0,
        clip_sample_max: float = 1.0,
        **schedule_args,
    ) -> None:
        super().__init__(num_train_timesteps, schedule, **schedule_args)

        if variance_type not in DDPMVarianceType.__members__.values():
            raise ValueError("Argument `variance_type` must be a member of `DDPMVarianceType`")
        if prediction_type not in DDPMPredictionType.__members__.values():
            raise ValueError("Argument `prediction_type` must be a member of `DDPMPredictionType`")
        if clip_sample_min >= clip_sample_max:
            raise ValueError("clip_sample_min must be < clip_sample_max")

        self.clip_sample = clip_sample
        self.variance_type = variance_type
        self.prediction_type = prediction_type
        self.clip_sample_values = (clip_sample_min, clip_sample_max)

    def set_timesteps(self, num_inference_steps: int, device=None) -> None:
        """Choose the (strided) subset of train timesteps used at inference."""
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError(
                f"`num_inference_steps`: {num_inference_steps} cannot be larger than "
                f"`num_train_timesteps`: {self.num_train_timesteps}"
            )
        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // num_inference_steps
        self.timesteps = (
            (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)
        )

    # -- posterior moments (also used by likelihood computation) ------------

    def _get_mean(self, timestep, x_0: jnp.ndarray, x_t: jnp.ndarray) -> jnp.ndarray:
        """Posterior mean of q(x_{t-1} | x_t, x_0) (DDPM eq. 7)."""
        t = jnp.asarray(timestep)
        alpha_t = jnp.take(self.alphas, t)
        alpha_prod_t = jnp.take(self.alphas_cumprod, t)
        alpha_prod_t_prev = self._alpha_cumprod_prev(t)
        beta_t = jnp.take(self.betas, t)

        x0_coef = jnp.sqrt(alpha_prod_t_prev) * beta_t / (1.0 - alpha_prod_t)
        xt_coef = jnp.sqrt(alpha_t) * (1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t)
        return x0_coef * x_0 + xt_coef * x_t

    def _get_variance(self, timestep, predicted_variance: jnp.ndarray | None = None):
        """Posterior variance at t, per configured variance_type."""
        t = jnp.asarray(timestep)
        alpha_prod_t = jnp.take(self.alphas_cumprod, t)
        alpha_prod_t_prev = self._alpha_cumprod_prev(t)
        beta_t = jnp.take(self.betas, t)

        variance = (1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t) * beta_t
        if self.variance_type == DDPMVarianceType.FIXED_SMALL:
            variance = jnp.clip(variance, 1e-20, None)
        elif self.variance_type == DDPMVarianceType.FIXED_LARGE:
            variance = beta_t
        elif self.variance_type == DDPMVarianceType.LEARNED:
            return predicted_variance
        elif self.variance_type == DDPMVarianceType.LEARNED_RANGE:
            min_log = variance
            max_log = beta_t
            frac = (predicted_variance + 1.0) / 2.0
            variance = frac * max_log + (1.0 - frac) * min_log
        return variance

    def step(
        self,
        model_output: jnp.ndarray,
        timestep,
        sample: jnp.ndarray,
        key: jax.Array | None = None,
        generator=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """One reverse-diffusion step x_t -> x_{t-1}.

        Args:
            model_output: raw network output (channel-doubled when the
                variance is learned).
            timestep: scalar int timestep (python int or traced).
            sample: x_t, shape (B, C, *spatial).
            key: PRNG key for the ancestral noise; required unless sampling
                deterministically at t=0 only.

        Returns:
            (pred_prev_sample, pred_original_sample)
        """
        _reject_torch_generator(generator)
        if (
            model_output.shape[1] == sample.shape[1] * 2
            and self.variance_type in (DDPMVarianceType.LEARNED, DDPMVarianceType.LEARNED_RANGE)
        ):
            model_output, predicted_variance = jnp.split(model_output, 2, axis=1)
        else:
            predicted_variance = None

        t = jnp.asarray(timestep)
        alpha_prod_t = jnp.take(self.alphas_cumprod, t)
        alpha_prod_t_prev = self._alpha_cumprod_prev(t)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev

        if self.prediction_type == DDPMPredictionType.EPSILON:
            pred_original_sample = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                alpha_prod_t
            )
        elif self.prediction_type == DDPMPredictionType.SAMPLE:
            pred_original_sample = model_output
        else:  # v_prediction
            pred_original_sample = (
                jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output
            )

        if self.clip_sample:
            pred_original_sample = jnp.clip(pred_original_sample, *self.clip_sample_values)

        beta_t = jnp.take(self.betas, t)
        alpha_t = jnp.take(self.alphas, t)
        pred_original_sample_coeff = jnp.sqrt(alpha_prod_t_prev) * beta_t / beta_prod_t
        current_sample_coeff = jnp.sqrt(alpha_t) * beta_prod_t_prev / beta_prod_t

        pred_prev_sample = (
            pred_original_sample_coeff * pred_original_sample + current_sample_coeff * sample
        )

        if key is not None:
            noise = jax.random.normal(key, model_output.shape, dtype=model_output.dtype)
            std = jnp.sqrt(self._get_variance(t, predicted_variance=predicted_variance))
            # no noise at t == 0 (traced-safe gate instead of a python branch)
            pred_prev_sample = pred_prev_sample + jnp.where(t > 0, std, 0.0) * noise

        return pred_prev_sample, pred_original_sample
