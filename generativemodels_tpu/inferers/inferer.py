"""Diffusion inferers: training forward, reverse sampling, likelihood.

Reference parity: generative/inferers/inferer.py — DiffusionInferer
(:31-321). Same public surface (__call__ / sample / get_likelihood with
crossattn|concat conditioning, SPADE `seg` pass-through, intermediates,
original/scaled input ranges for the discretised decoder NLL).

TPU-first design: the reverse loop and the full-T likelihood loop compile
into a single `lax.scan` (one XLA program; no per-step host dispatch).
`diffusion_model` is any callable `(x, timesteps, context=None[, seg=...])`
returning the model prediction — typically a partial of
`model.apply(variables, ...)`. Stochastic steps take explicit PRNG keys.
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..networks.schedulers import DDPMScheduler

ModelFn = Callable[..., jnp.ndarray]


def _call_model(model: ModelFn, x, timesteps, context, seg):
    kwargs: dict[str, Any] = {}
    if seg is not None:
        kwargs["seg"] = seg
    return model(x, timesteps, context=context, **kwargs)


class DiffusionInferer:
    """Pairs a diffusion model callable with a scheduler.

    Args:
        scheduler: a Scheduler instance (DDPM/DDIM/PNDM).
    """

    def __init__(self, scheduler) -> None:
        self.scheduler = scheduler

    # -- training forward ----------------------------------------------------

    def __call__(
        self,
        inputs: jnp.ndarray,
        diffusion_model: ModelFn,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
        condition: jnp.ndarray | None = None,
        mode: str = "crossattn",
        seg: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """One supervised training forward: add_noise then predict."""
        if mode not in ("crossattn", "concat"):
            raise NotImplementedError(f"{mode} condition is not supported")

        noisy_image = self.scheduler.add_noise(inputs, noise, timesteps)
        if mode == "concat":
            noisy_image = jnp.concatenate([noisy_image, condition], axis=1)
            condition = None
        return _call_model(diffusion_model, noisy_image, timesteps, condition, seg)

    # -- sampling ------------------------------------------------------------

    def _model_input(self, image, conditioning, mode):
        if mode == "concat":
            return jnp.concatenate([image, conditioning], axis=1), None
        return image, conditioning

    def sample(
        self,
        input_noise: jnp.ndarray,
        diffusion_model: ModelFn,
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
        """Full reverse-diffusion loop from `input_noise`.

        Without intermediates the loop is one `lax.scan`; with
        `save_intermediates` a host loop collects every
        `intermediate_steps`-th image (matching the reference API).
        `key` drives the DDPM ancestral noise (and DDIM eta>0 noise).
        """
        if mode not in ("crossattn", "concat"):
            raise NotImplementedError(f"{mode} condition is not supported")
        scheduler = scheduler or self.scheduler
        if key is None:
            key = jax.random.PRNGKey(0)

        timesteps = jnp.asarray(scheduler.timesteps)
        # stateful schedulers (PNDM, DPM-Solver++) thread an explicit state
        # pytree through the scan: step(state, model_output, t, sample)
        is_stateful = hasattr(scheduler, "init_state")
        is_ddpm = isinstance(scheduler, DDPMScheduler)

        def model_eval(image, t):
            x, ctx = self._model_input(image, conditioning, mode)
            tt = jnp.full(image.shape[:1], t)
            return _call_model(diffusion_model, x, tt, ctx, seg)

        def step(carry, t):
            if is_stateful:
                image, state, k = carry
                model_output = model_eval(image, t)
                image, state = scheduler.step(state, model_output, t, image)
                return (image, state, k), image
            image, k = carry
            k, sub = jax.random.split(k)
            model_output = model_eval(image, t)
            if is_ddpm:
                image, _ = scheduler.step(model_output, t, image, key=sub)
            else:  # DDIM
                image, _ = scheduler.step(model_output, t, image, eta=eta, key=sub if eta > 0 else None)
            return (image, k), image

        if is_stateful:
            key, state_key = jax.random.split(key)
            init = (
                input_noise,
                scheduler.init_state(input_noise.shape, input_noise.dtype, key=state_key),
                key,
            )
        else:
            init = (input_noise, key)

        if not save_intermediates:
            carry, _ = jax.lax.scan(lambda c, t: (step(c, t)[0], None), init, timesteps)
            return carry[0]

        intermediates = []
        carry = init
        for i, t in enumerate(scheduler.timesteps):
            if verbose:
                print(f"sampling step {i + 1}/{len(scheduler.timesteps)} (t={int(t)})")
            carry, image = step(carry, jnp.asarray(t))
            if int(t) % intermediate_steps == 0:
                intermediates.append(image)
        return carry[0], intermediates

    # -- likelihood ----------------------------------------------------------

    def get_likelihood(
        self,
        inputs: jnp.ndarray,
        diffusion_model: ModelFn,
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
        """Per-image ELBO: sum over t of KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)),
        with a discretised Gaussian decoder NLL at t=0.

        `noise` overrides the internally drawn corruption noise (the
        reference draws it once per call, inferer.py:190 — injecting the
        same array makes the two frameworks bit-comparable).
        """
        scheduler = scheduler or self.scheduler
        if not isinstance(scheduler, DDPMScheduler):
            raise NotImplementedError(
                "Likelihood computation is only compatible with DDPMScheduler"
            )
        if mode not in ("crossattn", "concat"):
            raise NotImplementedError(f"{mode} condition is not supported")
        if noise is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            noise = jax.random.normal(key, inputs.shape, dtype=inputs.dtype)
        timesteps = jnp.asarray(scheduler.timesteps)

        def step_kl(t):
            tt = jnp.full(inputs.shape[:1], t)
            noisy_image = scheduler.add_noise(inputs, noise, tt)
            x, ctx = self._model_input(noisy_image, conditioning, mode)
            model_output = _call_model(diffusion_model, x, tt, ctx, seg)

            if (
                model_output.shape[1] == inputs.shape[1] * 2
                and scheduler.variance_type in ("learned", "learned_range")
            ):
                model_output, predicted_variance = jnp.split(model_output, 2, axis=1)
            else:
                predicted_variance = None

            alpha_prod_t = jnp.take(scheduler.alphas_cumprod, t)
            alpha_prod_t_prev = scheduler._alpha_cumprod_prev(t)
            beta_prod_t = 1.0 - alpha_prod_t
            beta_prod_t_prev = 1.0 - alpha_prod_t_prev

            if scheduler.prediction_type == "epsilon":
                pred_x0 = (noisy_image - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                    alpha_prod_t
                )
            elif scheduler.prediction_type == "sample":
                pred_x0 = model_output
            else:  # v_prediction
                pred_x0 = jnp.sqrt(alpha_prod_t) * noisy_image - jnp.sqrt(
                    beta_prod_t
                ) * model_output
            if scheduler.clip_sample:
                pred_x0 = jnp.clip(pred_x0, -1, 1)

            beta_t = jnp.take(scheduler.betas, t)
            alpha_t = jnp.take(scheduler.alphas, t)
            pred_x0_coeff = jnp.sqrt(alpha_prod_t_prev) * beta_t / beta_prod_t
            current_coeff = jnp.sqrt(alpha_t) * beta_prod_t_prev / beta_prod_t
            predicted_mean = pred_x0_coeff * pred_x0 + current_coeff * noisy_image

            posterior_mean = scheduler._get_mean(t, inputs, noisy_image)
            if scheduler.variance_type in ("learned", "learned_range"):
                # true posterior variance of q(x_{t-1}|x_t,x_0) (DDPM eq. 7);
                # the scheduler's learned-variance accessor needs the model
                # output and does not define the true posterior
                posterior_variance = jnp.clip(
                    beta_prod_t_prev / beta_prod_t * beta_t, 1e-20, None
                )
            else:
                posterior_variance = scheduler._get_variance(t)
            log_posterior_variance = jnp.log(posterior_variance)
            if predicted_variance is not None:
                # the model's variance channel goes through the scheduler's
                # variance interpolation; the reference's corresponding path
                # (inferer.py:243) logs the raw channel and cannot execute —
                # this is the working definition.
                model_variance = scheduler._get_variance(t, predicted_variance)
                log_predicted_variance = jnp.log(jnp.clip(model_variance, 1e-20, None))
            else:
                log_predicted_variance = log_posterior_variance

            # KL between the true posterior and the model's gaussian (t > 0)
            kl_gauss = 0.5 * (
                -1.0
                + log_predicted_variance
                - log_posterior_variance
                + jnp.exp(log_posterior_variance - log_predicted_variance)
                + ((posterior_mean - predicted_mean) ** 2)
                * jnp.exp(-log_predicted_variance)
            )
            # discretised decoder NLL (t == 0)
            kl_decoder = -self._get_decoder_log_likelihood(
                inputs=inputs,
                means=predicted_mean,
                log_scales=0.5 * log_predicted_variance,
                original_input_range=original_input_range,
                scaled_input_range=scaled_input_range,
            )
            kl = jnp.where(t == 0, kl_decoder, kl_gauss)
            return kl

        if not save_intermediates:
            def body(total, t):
                kl = step_kl(t)
                return total + kl.reshape(kl.shape[0], -1).mean(axis=1), None

            total_kl, _ = jax.lax.scan(body, jnp.zeros(inputs.shape[0]), timesteps)
            return total_kl

        total_kl = jnp.zeros(inputs.shape[0])
        intermediates = []
        for i, t in enumerate(scheduler.timesteps):
            if verbose:
                print(f"likelihood step {i + 1}/{len(scheduler.timesteps)}")
            kl = step_kl(jnp.asarray(t))
            total_kl = total_kl + kl.reshape(kl.shape[0], -1).mean(axis=1)
            intermediates.append(kl)
        return total_kl, intermediates

    @staticmethod
    def _approx_standard_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
        """Fast tanh approximation of the standard normal CDF."""
        return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))

    def _get_decoder_log_likelihood(
        self,
        inputs: jnp.ndarray,
        means: jnp.ndarray,
        log_scales: jnp.ndarray,
        original_input_range: tuple = (0, 255),
        scaled_input_range: tuple = (0, 1),
    ) -> jnp.ndarray:
        """Log-likelihood of a Gaussian discretised to the input's bin width."""
        if inputs.shape != means.shape:
            raise ValueError("inputs and means must have the same shape")
        bin_width = (scaled_input_range[1] - scaled_input_range[0]) / (
            original_input_range[1] - original_input_range[0]
        )
        centered_x = inputs - means
        inv_stdv = jnp.exp(-log_scales)
        plus_in = inv_stdv * (centered_x + bin_width / 2)
        cdf_plus = self._approx_standard_normal_cdf(plus_in)
        min_in = inv_stdv * (centered_x - bin_width / 2)
        cdf_min = self._approx_standard_normal_cdf(min_in)
        log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
        log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
        cdf_delta = cdf_plus - cdf_min
        log_probs = jnp.where(
            inputs < -0.999,
            log_cdf_plus,
            jnp.where(
                inputs > 0.999,
                log_one_minus_cdf_min,
                jnp.log(jnp.clip(cdf_delta, 1e-12, None)),
            ),
        )
        return log_probs
