"""SDE-DPM-Solver++ few-step diversity, measured on a trained field.

The claim behind `algorithm_type="sde-dpmsolver++"` (beyond reference —
the reference's only stochastic sampler is 1000-step ancestral DDPM):
DDPM-style stochastic variation at ~100x fewer steps. The clean
measurable property: from ONE FIXED initial noise, re-sampling with
different keys gives
  - ancestral DDPM-1000: genuinely varied outputs,
  - SDE-DPM-10: comparably varied outputs,
  - ODE-DPM-10: bit-identical outputs (deterministic — the key is unused).

Trains the tiny 2D field on-chip (~40 s), then draws 8 samples per route
from the same z0 and reports mean pairwise MS-SSIM (lower = more
diverse) plus the ODE determinism check.
Writes benchmarks/results_sde_diversity.json.
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import optax

from generativemodels_tpu.inferers import DiffusionInferer
from generativemodels_tpu.metrics import MultiScaleSSIMMetric
from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import (
    DDPMScheduler,
    DPMSolverMultistepScheduler,
)
from generativemodels_tpu.parallel import init_train_state, make_diffusion_train_step
from generativemodels_tpu.recipes.train_2d_ddpm import synthetic_batch

BATCH, SIZE, STEPS, DRAWS = 32, 32, 400, 8


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64), attention_levels=(False, True),
        num_head_channels=64, norm_num_groups=32,
    )
    x0 = jnp.zeros((BATCH, 1, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((BATCH,), jnp.int32)
    )
    sched = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-4)
    apply = lambda p, x, t: model.apply({"params": p}, x, t)
    step = make_diffusion_train_step(apply, sched, tx, donate=False)
    state = init_train_state(variables["params"], tx)
    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    for _ in range(STEPS):
        rng, kd, ks = jax.random.split(rng, 3)
        state, _ = step(state, synthetic_batch(kd, BATCH, SIZE) * 2 - 1, ks)
    train_s = time.time() - t0

    fn = lambda x, t, context=None: apply(state.params, x, t)
    z0 = jax.random.normal(jax.random.PRNGKey(7), (1, 1, SIZE, SIZE))
    ms = MultiScaleSSIMMetric(spatial_dims=2, data_range=2.0, weights=(0.5, 0.5))

    def draws(make_sched, steps):
        out = []
        sch = make_sched()
        sch.set_timesteps(steps)
        inf = DiffusionInferer(sch)
        sample = jax.jit(lambda nz, key, _inf=inf: _inf.sample(nz, fn, key=key))
        for i in range(DRAWS):
            out.append(sample(z0, jax.random.PRNGKey(100 + i)))
        return jnp.concatenate(out)

    routes = {
        "ddpm1000_ancestral": draws(
            lambda: DDPMScheduler(num_train_timesteps=1000), 1000
        ),
        "sde_dpmsolver10": draws(
            lambda: DPMSolverMultistepScheduler(
                num_train_timesteps=1000, algorithm_type="sde-dpmsolver++"
            ),
            10,
        ),
        "ode_dpmsolver10": draws(
            lambda: DPMSolverMultistepScheduler(num_train_timesteps=1000), 10
        ),
    }

    def pairwise_msssim(imgs):
        vals = [
            float(jnp.mean(ms(imgs[a : a + 1], imgs[b : b + 1])))
            for a, b in itertools.combinations(range(imgs.shape[0]), 2)
        ]
        return sum(vals) / len(vals)

    ode = routes["ode_dpmsolver10"]
    result = {
        "metric": "sde_solver_fixed_noise_diversity",
        "train_s": round(train_s, 1),
        "mean_pairwise_ms_ssim": {
            k: round(pairwise_msssim(v), 4) for k, v in routes.items()
        },
        "ode_max_abs_spread": float(
            jnp.max(jnp.abs(ode - ode[:1]))
        ),  # determinism check: must be ~0
        "note": "8 draws from ONE fixed init noise, different keys; lower "
                "MS-SSIM = more stochastic variation; the ODE route must "
                "be key-independent",
        "config": f"2D UNet(32,64) {SIZE}px, {STEPS} train steps, synthetic blobs",
        "backend": jax.default_backend(),
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_sde_diversity.json"
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
