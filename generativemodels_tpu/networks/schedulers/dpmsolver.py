"""DPM-Solver++ multistep scheduler (Lu et al. 2022, arXiv:2211.01095).

Beyond-reference capability: the reference (Project-MONAI/GenerativeModels)
ships only DDPM / DDIM / PNDM (`generative/networks/schedulers/`), so its
tutorials sample with 50-1000 model evaluations. DPM-Solver++ (2M) is the
de-facto fast ODE sampler for diffusion models: a second-order multistep
exponential integrator in the data-prediction parameterisation that reaches
DDIM-50 quality in 10-20 evaluations. Its order-1 special case is
*mathematically identical* to deterministic DDIM (tested exactly in
tests/test_schedulers.py), so it is a strict upgrade knob on every DDIM
sampling recipe in this package.

TPU-first design: unlike the usual implementations (mutable python lists of
model outputs, per-step branching on `step_index`), every per-step
coefficient here — the `sigma_t/sigma_s` sample carry, the
`alpha_t (1 - e^{-h})` data carry, and the second-order lookback weight
`h_i / (2 h_{i-1})` — is precomputed in float64 numpy at
:meth:`set_timesteps` and stored as device tables indexed by a step counter
carried in an explicit :class:`DPMSolverState` pytree. The zero-final-sigma
boundary (where `lambda = log(alpha/sigma)` diverges) and the forced
order-1 steps (first step; final step) are evaluated *exactly* at plan time,
so the traced :meth:`step` body is pure gathers + FMAs with no `lax.switch`
— the whole sampling loop compiles into one `lax.scan`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import StrEnum
from .scheduler import Scheduler


class DPMSolverPredictionType(StrEnum):
    EPSILON = "epsilon"
    SAMPLE = "sample"
    V_PREDICTION = "v_prediction"


class DPMSolverAlgorithmType(StrEnum):
    DPMSOLVER_PP = "dpmsolver++"
    SDE_DPMSOLVER_PP = "sde-dpmsolver++"


class DPMSolverState(NamedTuple):
    """Carry state for DPM-Solver++ multistep stepping inside `lax.scan`."""

    counter: jnp.ndarray  # int32 scalar: index into the inference plan
    prev_x0: jnp.ndarray  # D_{i-1}: previous data prediction (zeros at i=0)
    key: jnp.ndarray  # PRNG key for the SDE variant (unused when deterministic)


class DPMSolverMultistepScheduler(Scheduler):
    """DPM-Solver++ (2M): second-order multistep fast ODE sampler.

    The probability-flow ODE in log-SNR time ``lambda = log(alpha/sigma)``
    with the data prediction ``D = x0(x_t, t)`` has the exact solution

        ``x_t = (sigma_t / sigma_s) x_s + alpha_t (1 - e^{-h}) D_bar``,

    where ``h = lambda_t - lambda_s`` and ``D_bar`` approximates ``D`` over
    the step. Order 1 uses ``D_bar = D_i`` (identical to deterministic
    DDIM); order 2 ("2M") adds the finite-difference correction

        ``D_bar = (1 + c) D_i - c D_{i-1},  c = h_i / (2 h_{i-1})``.

    Args:
        num_train_timesteps: diffusion steps used at train time.
        schedule: NoiseSchedules member name (see scheduler.py).
        solver_order: 1 (== DDIM) or 2 (default, the "2M" method).
        prediction_type: member of DPMSolverPredictionType.
        algorithm_type: "dpmsolver++" (default, the deterministic ODE
            solver) or "sde-dpmsolver++" — the stochastic variant solving
            the reverse SDE with the same exponential-integrator machinery
            (Lu et al. 2022, §App. SDE-DPM-Solver++). Per step it carries
            ``(sigma_t/sigma_s) e^{-h}`` of the sample, injects
            ``alpha_t (1 - e^{-2h}) D_bar``, and adds fresh noise
            ``sigma_t sqrt(1 - e^{-2h})``; the order-2 lookback weight is
            the same ``h_i / (2 h_{i-1})`` table. Order 1 at full step
            count is exactly ancestral DDPM sampling's marginal process;
            at few steps it trades DDIM-determinism for sample diversity
            the reference can only get from 1000-step DDPM. The noise
            stream rides a PRNG key inside :class:`DPMSolverState`
            (seed it via ``init_state(..., key=...)``).
        clip_sample: clip the data prediction each step (off by default:
            x0-clipping biases fast solvers; enable only for pixel-space
            models trained on [-1, 1]).
        set_alpha_to_one: final boundary alpha-bar is 1.0 (zero final
            sigma: the last step lands exactly on the data manifold and is
            forced to order 1, where the sigma->0 limit is exact).
        lower_order_final: force order 1 on the final step for short plans
            (< 15 steps) even when the final sigma is nonzero — the
            standard stabilisation for few-step sampling.
        timestep_spacing: "uniform_lambda" (default) spaces the inference
            timesteps uniformly in log-SNR ``lambda`` (the DPM-Solver
            paper's grid, snapped to the trained integer timesteps) —
            measured on the analytic Gaussian diffusion this is what makes
            order 2 actually converge at second order; under the
            DDIM-style uniform-t "leading" grid the lambda increments
            explode near t=0 (linear-beta schedules) and the multistep
            extrapolation overshoots. "leading" reproduces
            DDIMScheduler.set_timesteps exactly (used by the order-1 ==
            DDIM equivalence test).
        steps_offset: offset added to inference timesteps under "leading"
            spacing (stable-diffusion compatibility, as in DDIMScheduler).
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        schedule: str = "linear_beta",
        solver_order: int = 2,
        prediction_type: str = DPMSolverPredictionType.EPSILON,
        algorithm_type: str = DPMSolverAlgorithmType.DPMSOLVER_PP,
        clip_sample: bool = False,
        set_alpha_to_one: bool = True,
        lower_order_final: bool = True,
        timestep_spacing: str = "uniform_lambda",
        steps_offset: int = 0,
        clip_sample_min: float = -1.0,
        clip_sample_max: float = 1.0,
        **schedule_args,
    ) -> None:
        super().__init__(num_train_timesteps, schedule, **schedule_args)

        if prediction_type not in DPMSolverPredictionType.__members__.values():
            raise ValueError(
                "Argument `prediction_type` must be a member of DPMSolverPredictionType"
            )
        if solver_order not in (1, 2):
            raise ValueError(f"solver_order must be 1 or 2, got {solver_order}")
        if algorithm_type not in DPMSolverAlgorithmType.__members__.values():
            raise ValueError(
                "Argument `algorithm_type` must be a member of DPMSolverAlgorithmType"
            )
        if timestep_spacing not in ("uniform_lambda", "leading"):
            raise ValueError(
                f"timestep_spacing must be 'uniform_lambda' or 'leading', got {timestep_spacing}"
            )
        if clip_sample_min >= clip_sample_max:
            raise ValueError("clip_sample_min must be < clip_sample_max")

        self.prediction_type = prediction_type
        self.algorithm_type = algorithm_type
        self.solver_order = solver_order
        self.clip_sample = clip_sample
        self.clip_sample_values = (clip_sample_min, clip_sample_max)
        self.lower_order_final = lower_order_final
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.final_alpha_cumprod_value = (
            1.0 if set_alpha_to_one else float(self.alphas_cumprod[0])
        )
        self.init_noise_sigma = 1.0

        self.set_timesteps(num_train_timesteps)

    # -- plan ----------------------------------------------------------------

    def set_timesteps(self, num_inference_steps: int, device=None) -> None:
        """Build the inference plan and precompute all per-step coefficients.

        "leading" spacing reproduces DDIMScheduler.set_timesteps exactly
        (round(arange * ratio), descending, + steps_offset), so order 1 and
        DDIM(eta=0) visit identical (t, abar) pairs. "uniform_lambda"
        places the grid uniformly in log-SNR between lambda(t_max) and
        lambda(0), snapped to the nearest trained integer timestep
        (duplicates collapse, so the realised plan can be slightly shorter
        than requested at extreme step counts — `self.num_inference_steps`
        reports the realised length).
        """
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError(
                f"`num_inference_steps`: {num_inference_steps} cannot be larger than "
                f"`num_train_timesteps`: {self.num_train_timesteps}"
            )
        abar = np.asarray(self.alphas_cumprod, dtype=np.float64)
        if self.timestep_spacing == "leading":
            step_ratio = self.num_train_timesteps // num_inference_steps
            timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
            )
            timesteps = timesteps + self.steps_offset
        else:  # uniform_lambda
            lam_full = 0.5 * (np.log(abar) - np.log1p(-abar))  # ascending as t descends
            targets = np.linspace(lam_full[-1], lam_full[0], num_inference_steps)
            idx = np.abs(lam_full[None, :] - targets[:, None]).argmin(axis=1)
            timesteps_list: list[int] = []
            for t in idx:
                if not timesteps_list or int(t) < timesteps_list[-1]:
                    timesteps_list.append(int(t))
            timesteps = np.asarray(timesteps_list, dtype=np.int64)
        num_inference_steps = len(timesteps)
        self.num_inference_steps = num_inference_steps
        self.timesteps = timesteps.astype(np.int32)

        # f64 plan: abar at each visited timestep, plus the final boundary.
        abar_path = np.concatenate(
            [abar[timesteps], [self.final_alpha_cumprod_value]]
        )  # (n+1,): source abar of step i is [i], target is [i+1]
        alpha = np.sqrt(abar_path)
        sigma = np.sqrt(1.0 - abar_path)
        with np.errstate(divide="ignore"):  # final boundary sigma may be 0 -> lam = +inf
            lam = np.log(alpha) - np.log(sigma)

        n = num_inference_steps
        alpha_s, alpha_t = alpha[:-1], alpha[1:]
        sigma_s, sigma_t = sigma[:-1], sigma[1:]
        h = lam[1:] - lam[:-1]  # (n,) log-SNR increments, h[i] > 0; may be +inf at the end

        # e^{-h} computed from the ratios directly: exact 0 at sigma_t == 0,
        # no inf arithmetic anywhere on this path.
        exp_neg_h = (sigma_t * alpha_s) / (sigma_s * alpha_t)
        if self.algorithm_type == DPMSolverAlgorithmType.SDE_DPMSOLVER_PP:
            # SDE variant: stronger contraction of the sample (e^{-2h} via
            # the extra e^{-h} factor), matching injected data term, and a
            # fresh-noise term restoring the marginal variance. All exact
            # at the sigma_t == 0 boundary (every coefficient -> its
            # order-1 limit with zero noise).
            c_x = (sigma_t / sigma_s) * exp_neg_h
            c_d = alpha_t * (1.0 - exp_neg_h**2)
            c_n = sigma_t * np.sqrt(np.maximum(1.0 - exp_neg_h**2, 0.0))
        else:
            c_x = sigma_t / sigma_s  # sample carry
            c_d = alpha_t * (1.0 - exp_neg_h)  # data carry
            c_n = np.zeros(n, dtype=np.float64)

        # Second-order lookback weight c_i = h_i / (2 h_{i-1}); zero where the
        # step is forced to order 1: the first step (no history), the final
        # step when it lands on sigma = 0 (the order-2 weight h_i/(2 h_{i-1})
        # diverges with h_i -> inf; the order-1 limit is exact), and the
        # final step of short plans (lower_order_final, the standard
        # stabilisation: the last step has the largest h and an
        # extrapolated D_bar there overshoots).
        c2 = np.zeros(n, dtype=np.float64)
        if self.solver_order == 2 and n >= 2:
            c2[1:] = h[1:] / (2.0 * h[:-1])
            if sigma_t[-1] == 0.0:
                c2[-1] = 0.0
            elif self.lower_order_final and n < 15:
                c2[-1] = 0.0
        self._c_x = jnp.asarray(c_x, dtype=jnp.float32)
        self._c_d = jnp.asarray(c_d, dtype=jnp.float32)
        self._c_n = jnp.asarray(c_n, dtype=jnp.float32)
        self._c2 = jnp.asarray(c2, dtype=jnp.float32)

    # -- explicit state --------------------------------------------------------

    def init_state(
        self, sample_shape: tuple[int, ...], dtype=jnp.float32, key=None
    ) -> DPMSolverState:
        if key is None and self.algorithm_type == DPMSolverAlgorithmType.SDE_DPMSOLVER_PP:
            import warnings

            warnings.warn(
                "DPMSolverScheduler.init_state: algorithm_type='sde-dpmsolver++' "
                "with key=None uses the fixed PRNGKey(0) — every run draws the "
                "SAME 'stochastic' noise. Pass key=jax.random.PRNGKey(seed) for "
                "distinct samples.",
                stacklevel=2,
            )
        return DPMSolverState(
            counter=jnp.asarray(0, jnp.int32),
            prev_x0=jnp.zeros(sample_shape, dtype=dtype),
            key=jax.random.PRNGKey(0) if key is None else key,
        )

    # -- core math -------------------------------------------------------------

    def _predict_x0(self, model_output, sample, timestep):
        """Data prediction D(x_t, t) per configured prediction type."""
        abar = jnp.take(self.alphas_cumprod, jnp.asarray(timestep))
        sqrt_a = jnp.sqrt(abar)
        sqrt_b = jnp.sqrt(1.0 - abar)
        if self.prediction_type == DPMSolverPredictionType.EPSILON:
            x0 = (sample - sqrt_b * model_output) / sqrt_a
        elif self.prediction_type == DPMSolverPredictionType.SAMPLE:
            x0 = model_output
        else:  # v_prediction
            x0 = sqrt_a * sample - sqrt_b * model_output
        if self.clip_sample:
            x0 = jnp.clip(x0, *self.clip_sample_values)
        return x0

    def step(
        self, state: DPMSolverState, model_output: jnp.ndarray, timestep, sample: jnp.ndarray
    ) -> tuple[jnp.ndarray, DPMSolverState]:
        """One DPM-Solver++ multistep update x_{t_i} -> x_{t_{i+1}}.

        `timestep` must be `self.timesteps[state.counter]` — the inferers'
        scan passes exactly this. Returns (prev_sample, new_state).
        """
        i = state.counter
        x0 = self._predict_x0(model_output, sample, timestep).astype(jnp.float32)

        c2 = jnp.take(self._c2, i)
        d_bar = (1.0 + c2) * x0 - c2 * state.prev_x0.astype(jnp.float32)
        prev_sample = jnp.take(self._c_x, i) * sample.astype(jnp.float32) + jnp.take(
            self._c_d, i
        ) * d_bar
        key = state.key
        if self.algorithm_type == DPMSolverAlgorithmType.SDE_DPMSOLVER_PP:
            key, sub = jax.random.split(key)
            prev_sample = prev_sample + jnp.take(self._c_n, i) * jax.random.normal(
                sub, prev_sample.shape, jnp.float32
            )
        new_state = DPMSolverState(
            counter=i + 1, prev_x0=x0.astype(state.prev_x0.dtype), key=key
        )
        return prev_sample.astype(sample.dtype), new_state
