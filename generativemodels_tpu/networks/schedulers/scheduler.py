"""Noise-schedule registry and scheduler base class (JAX-native).

Reference parity: generative/networks/schedulers/scheduler.py:40-200
(NoiseSchedules registry with linear/scaled_linear/sigmoid/cosine schedules;
Scheduler base with add_noise / get_velocity).

TPU-first design: all coefficients are precomputed float32 `jnp` arrays so a
traced timestep can gather into them inside `jit`/`lax.scan` — there is no
host-side scalar indexing on the hot path. Stochastic methods take explicit
`jax.random` keys.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils import ComponentStore, unsqueeze_right

NoiseSchedules = ComponentStore("NoiseSchedules", "Functions to generate noise schedules")


@NoiseSchedules.add_def("linear_beta", "Linear beta schedule")
def _linear_beta(num_train_timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2):
    """Linear beta noise schedule: betas evenly spaced in [beta_start, beta_end]."""
    return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)


@NoiseSchedules.add_def("scaled_linear_beta", "Scaled linear beta schedule")
def _scaled_linear_beta(num_train_timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2):
    """Scaled-linear (stable-diffusion style) schedule: sqrt-space linear, squared."""
    return (
        jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32) ** 2
    )


@NoiseSchedules.add_def("sigmoid_beta", "Sigmoid beta schedule")
def _sigmoid_beta(
    num_train_timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    sig_range: float = 6,
):
    """Sigmoid-shaped beta schedule over [-sig_range, sig_range]."""
    x = jnp.linspace(-sig_range, sig_range, num_train_timesteps, dtype=jnp.float32)
    return jax_sigmoid(x) * (beta_end - beta_start) + beta_start


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


@NoiseSchedules.add_def("cosine", "Cosine schedule")
def _cosine_beta(num_train_timesteps: int, s: float = 8e-3):
    """Cosine schedule (Nichol & Dhariwal, https://arxiv.org/abs/2102.09672).

    Returns the (betas, alphas, alphas_cumprod) triple.
    """
    x = jnp.linspace(0, num_train_timesteps, num_train_timesteps + 1, dtype=jnp.float32)
    alphas_cumprod = jnp.cos(((x / num_train_timesteps) + s) / (1 + s) * jnp.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    alphas = jnp.clip(alphas_cumprod[1:] / alphas_cumprod[:-1], 0.0001, 0.9999)
    betas = 1.0 - alphas
    return betas, alphas, alphas_cumprod[:-1]


def _reject_torch_generator(generator) -> None:
    """Guard for the reference's `generator=` kwarg (a torch.Generator).

    Accepted as None so 1:1 ports that pass `generator=None` run
    unchanged (reference: generative/networks/schedulers/ddpm.py:245);
    a real generator cannot drive jax.random — fail with the mapping
    instead of silently ignoring the caller's RNG.
    """
    if generator is not None:
        raise ValueError(
            "torch Generators are not usable here — pass key=jax.random."
            "PRNGKey(...) instead of generator= (explicit-RNG equivalent)."
        )


class Scheduler:
    """Base class holding precomputed schedule coefficient tables.

    A schedule function from :data:`NoiseSchedules` returns either a beta
    array or a (betas, alphas, alphas_cumprod) triple. The arrays live on
    device and are gathered with (possibly traced) integer timesteps, so
    every method here is safe to call inside `jit` / `lax.scan` bodies.

    Args:
        num_train_timesteps: number of diffusion steps the model trains with.
        schedule: name of a registered member of NoiseSchedules.
        schedule_args: forwarded keyword args for the schedule function.
    """

    def __init__(
        self, num_train_timesteps: int = 1000, schedule: str = "linear_beta", **schedule_args
    ) -> None:
        schedule_args["num_train_timesteps"] = num_train_timesteps
        noise_sched = NoiseSchedules[schedule](**schedule_args)

        if isinstance(noise_sched, tuple):
            self.betas, self.alphas, self.alphas_cumprod = noise_sched
        else:
            self.betas = noise_sched
            self.alphas = 1.0 - self.betas
            self.alphas_cumprod = jnp.cumprod(self.alphas, axis=0)

        self.num_train_timesteps = num_train_timesteps
        self.schedule = schedule

        # settable values
        self.num_inference_steps: int | None = None
        # host-side sampling plan (descending timesteps); consumed as scan xs
        self.timesteps = np.arange(num_train_timesteps - 1, -1, -1, dtype=np.int32)

    # -- gather helpers (traced-timestep safe) ------------------------------

    def _gather(self, table: jnp.ndarray, timesteps) -> jnp.ndarray:
        t = jnp.asarray(timesteps)
        return jnp.take(table, t, axis=0)

    def _alpha_cumprod_prev(self, timestep, final: float | jnp.ndarray = 1.0) -> jnp.ndarray:
        """alphas_cumprod[t-1] with `final` when t-1 < 0, traced-`t` safe."""
        t = jnp.asarray(timestep)
        prev = jnp.take(self.alphas_cumprod, jnp.clip(t - 1, 0, None), axis=0)
        return jnp.where(t > 0, prev, jnp.asarray(final, dtype=self.alphas_cumprod.dtype))

    # -- public API ---------------------------------------------------------

    def add_noise(
        self, original_samples: jnp.ndarray, noise: jnp.ndarray, timesteps
    ) -> jnp.ndarray:
        """Forward-noise x0 to x_t: sqrt(abar_t) x0 + sqrt(1-abar_t) eps."""
        abar = self._gather(self.alphas_cumprod, timesteps).astype(original_samples.dtype)
        sqrt_abar = unsqueeze_right(jnp.sqrt(abar), original_samples.ndim)
        sqrt_one_minus = unsqueeze_right(jnp.sqrt(1.0 - abar), original_samples.ndim)
        return sqrt_abar * original_samples + sqrt_one_minus * noise

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps) -> jnp.ndarray:
        """v-prediction target: sqrt(abar_t) eps - sqrt(1-abar_t) x0."""
        abar = self._gather(self.alphas_cumprod, timesteps).astype(sample.dtype)
        sqrt_abar = unsqueeze_right(jnp.sqrt(abar), sample.ndim)
        sqrt_one_minus = unsqueeze_right(jnp.sqrt(1.0 - abar), sample.ndim)
        return sqrt_abar * noise - sqrt_one_minus * sample
