"""PNDM scheduler (Liu et al. 2022), JAX-native with explicit state.

Reference parity: generative/networks/schedulers/pndm.py:55-317
(PNDMScheduler: Runge-Kutta warm-up `step_prk` followed by 4th-order
linear-multistep `step_plms`; `skip_prk_steps` PLMS-only mode; formula (9)
in `_get_prev_sample`).

The reference mutates python attributes (`counter`, `ets`, `cur_sample`)
between calls; here that state is an explicit :class:`PNDMState` pytree with
a fixed-shape 4-slot shift register for the eps history, so the whole
sampling loop compiles into a single `lax.scan`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import StrEnum
from .scheduler import Scheduler


class PNDMPredictionType(StrEnum):
    EPSILON = "epsilon"
    V_PREDICTION = "v_prediction"


class PNDMState(NamedTuple):
    """Carry state for PNDM stepping inside `lax.scan`."""

    counter: jnp.ndarray  # int32 scalar, number of step() calls so far
    cur_model_output: jnp.ndarray  # RK accumulator, same shape as sample
    cur_sample: jnp.ndarray  # sample retained across RK stages / PLMS warmup
    ets: jnp.ndarray  # (4, *sample_shape) shift register, newest at index 3
    ets_count: jnp.ndarray  # int32 scalar in [0, 4]


class PNDMScheduler(Scheduler):
    """Pseudo-numerical methods for diffusion models (F-PNDM, order 4).

    Args:
        num_train_timesteps: diffusion steps used at train time.
        schedule: NoiseSchedules member name.
        skip_prk_steps: skip Runge-Kutta warm-up (PLMS-only, crowsonkb-style).
        set_alpha_to_one: use 1.0 as previous alpha-bar past the final step.
        prediction_type: member of PNDMPredictionType.
        steps_offset: offset added to inference timesteps.
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        schedule: str = "linear_beta",
        skip_prk_steps: bool = False,
        set_alpha_to_one: bool = False,
        prediction_type: str = PNDMPredictionType.EPSILON,
        steps_offset: int = 0,
        **schedule_args,
    ) -> None:
        super().__init__(num_train_timesteps, schedule, **schedule_args)

        if prediction_type not in PNDMPredictionType.__members__.values():
            raise ValueError("Argument `prediction_type` must be a member of PNDMPredictionType")
        self.prediction_type = prediction_type

        self.final_alpha_cumprod = (
            jnp.asarray(1.0, dtype=jnp.float32) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.pndm_order = 4
        self.skip_prk_steps = skip_prk_steps
        self.steps_offset = steps_offset

        self.set_timesteps(num_train_timesteps)

    def set_timesteps(self, num_inference_steps: int, device=None) -> None:
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError(
                f"`num_inference_steps`: {num_inference_steps} cannot be larger than "
                f"`num_train_timesteps`: {self.num_train_timesteps}"
            )
        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // num_inference_steps
        base = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
        base += self.steps_offset

        if self.skip_prk_steps:
            self.prk_timesteps = np.array([], dtype=np.int64)
            self.plms_timesteps = base[::-1].copy()
        else:
            # RK warm-up visits the last `order` timesteps at full/half strides:
            # each of the 4 RK steps evaluates the model 4 times (t, t-d/2,
            # t-d/2, t-d) which produces the repeat/tile pattern below.
            half = step_ratio // 2
            prk = np.repeat(base[-self.pndm_order :], 2) + np.tile(
                np.array([0, half], dtype=np.int64), self.pndm_order
            )
            self.prk_timesteps = (np.repeat(prk[:-1], 2)[1:-1])[::-1].copy()
            self.plms_timesteps = base[:-3][::-1].copy()

        self.timesteps = np.concatenate([self.prk_timesteps, self.plms_timesteps]).astype(np.int32)
        self.num_inference_steps = len(self.timesteps)
        # device-side copy of the RK plan for traced-counter indexing
        self._prk_timesteps_dev = jnp.asarray(
            self.prk_timesteps if len(self.prk_timesteps) else np.zeros(1, np.int64),
            dtype=jnp.int32,
        )

    # -- explicit state ------------------------------------------------------

    def init_state(self, sample_shape: tuple[int, ...], dtype=jnp.float32, key=None) -> PNDMState:
        # `key` accepted for stateful-scheduler duck-typing (PNDM is deterministic)
        zeros = jnp.zeros(sample_shape, dtype=dtype)
        return PNDMState(
            counter=jnp.asarray(0, jnp.int32),
            cur_model_output=zeros,
            cur_sample=zeros,
            ets=jnp.zeros((4,) + tuple(sample_shape), dtype=dtype),
            ets_count=jnp.asarray(0, jnp.int32),
        )

    # -- core math -----------------------------------------------------------

    def _get_prev_sample(self, sample, timestep, prev_timestep, model_output):
        """PNDM paper formula (9): transfer x_t to x_{t-delta} given eps."""
        t = jnp.asarray(timestep)
        pt = jnp.asarray(prev_timestep)
        alpha_prod_t = jnp.take(self.alphas_cumprod, t)
        alpha_prod_t_prev = jnp.where(
            pt >= 0, jnp.take(self.alphas_cumprod, jnp.clip(pt, 0, None)), self.final_alpha_cumprod
        )
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev

        if self.prediction_type == PNDMPredictionType.V_PREDICTION:
            model_output = (
                jnp.sqrt(alpha_prod_t) * model_output + jnp.sqrt(beta_prod_t) * sample
            )

        sample_coeff = jnp.sqrt(alpha_prod_t_prev / alpha_prod_t)
        model_output_denom_coeff = alpha_prod_t * jnp.sqrt(beta_prod_t_prev) + jnp.sqrt(
            alpha_prod_t * beta_prod_t * alpha_prod_t_prev
        )
        return (
            sample_coeff * sample
            - (alpha_prod_t_prev - alpha_prod_t) * model_output / model_output_denom_coeff
        )

    @staticmethod
    def _append_ets(state: PNDMState, model_output: jnp.ndarray) -> PNDMState:
        ets = jnp.roll(state.ets, -1, axis=0).at[3].set(model_output)
        return state._replace(ets=ets, ets_count=jnp.minimum(state.ets_count + 1, 4))

    def _step_plms(self, state: PNDMState, model_output, timestep, sample):
        delta = self.num_train_timesteps // self.num_inference_steps
        t = jnp.asarray(timestep, jnp.int32)
        counter = state.counter

        is_second = counter == 1  # PLMS warm-up quirk: redo step from x_{t0}

        # ets append happens for every call except counter == 1
        appended = self._append_ets(state, model_output)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_second, b, a), appended, state
        )

        prev_t = jnp.where(is_second, t, t - delta)
        t_eff = jnp.where(is_second, t + delta, t)
        sample_eff = jnp.where(is_second, state.cur_sample, sample)

        e1, e2, e3, e4 = state.ets[3], state.ets[2], state.ets[1], state.ets[0]
        branch = jnp.where(
            (state.ets_count <= 1) & is_second,
            1,
            jnp.where(state.ets_count <= 1, 0, jnp.minimum(state.ets_count, 4)),
        )
        combined = jax.lax.switch(
            branch,
            [
                lambda: model_output,
                lambda: (model_output + e1) / 2.0,
                lambda: (3.0 * e1 - e2) / 2.0,
                lambda: (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0,
                lambda: (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0,
            ],
        )

        # retain x_{t0} while warming up (counter == 0) for the counter == 1 redo
        cur_sample = jnp.where(counter == 0, sample, state.cur_sample)
        state = state._replace(cur_sample=cur_sample)

        prev_sample = self._get_prev_sample(sample_eff, t_eff, prev_t, combined)
        return prev_sample, state._replace(counter=counter + 1)

    def _step_prk(self, state: PNDMState, model_output, timestep, sample):
        delta = self.num_train_timesteps // self.num_inference_steps
        t = jnp.asarray(timestep, jnp.int32)
        counter = state.counter
        stage = counter % 4

        diff_to_prev = jnp.where(counter % 2 == 0, delta // 2, 0)
        prev_t = t - diff_to_prev
        t_eff = jnp.take(self._prk_timesteps_dev, (counter // 4) * 4)

        # RK accumulation: 1/6, 1/3, 1/3, (acc + 1/6) weights
        acc = state.cur_model_output
        new_acc = jax.lax.switch(
            stage,
            [
                lambda: acc + model_output / 6.0,
                lambda: acc + model_output / 3.0,
                lambda: acc + model_output / 3.0,
                lambda: jnp.zeros_like(acc),
            ],
        )
        mo_eff = jnp.where(stage == 3, acc + model_output / 6.0, model_output)

        state = jax.lax.cond(
            stage == 0,
            lambda s: self._append_ets(s, model_output)._replace(cur_sample=sample),
            lambda s: s,
            state,
        )
        state = state._replace(cur_model_output=new_acc)

        prev_sample = self._get_prev_sample(state.cur_sample, t_eff, prev_t, mo_eff)
        return prev_sample, state._replace(counter=counter + 1)

    def step(
        self, state: PNDMState, model_output: jnp.ndarray, timestep, sample: jnp.ndarray
    ) -> tuple[jnp.ndarray, PNDMState]:
        """One PNDM step; dispatches RK warm-up vs linear-multistep on state.

        Returns (prev_sample, new_state). Unlike DDPM/DDIM there is no
        pred_original_sample (the reference returns None for it).
        """
        if self.skip_prk_steps or len(self.prk_timesteps) == 0:
            return self._step_plms(state, model_output, timestep, sample)

        n_prk = len(self.prk_timesteps)
        return jax.lax.cond(
            state.counter < n_prk,
            lambda: self._step_prk(state, model_output, timestep, sample),
            lambda: self._step_plms(state, model_output, timestep, sample),
        )
