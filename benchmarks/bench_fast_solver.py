"""3D 128^3 DPM-Solver++ sampling throughput vs DDIM (round 4).

Same model/config as bench_3d_ddim.py (the BASELINE north-star shape); the
variable is the solver: DDIM-50 vs DPM-Solver++ (2M) at 10/15/20 steps.
Per-step cost is one UNet forward either way, so the throughput gain is
~steps ratio; what earns it headline status is the solver's accuracy —
DPM-Solver++(2M)-15 matches DDIM-50's ODE-endpoint error on the analytic
convergence harness (tests/test_schedulers.py::TestDPMSolver), so the
samples are equivalent-quality, ~3x cheaper.

Also records per-solver agreement: MS-SSIM between each fast-solver output
and the DDIM-200 endpoint from the SAME noise (a trajectory-agreement
measure that needs no trained weights; both solvers approximate the same
probability-flow ODE of the same (random-weight) model).

Writes benchmarks/results_fast_solver.json and prints rows as it goes.

`--trained`: the same agreement battery on a TRAINED score field — train
the 2D tutorial config (synthetic blobs, ~300 steps) and compare each
solver's endpoint against DDIM-200 from identical noise. The random-weight
3D run shows solver fidelity on an arbitrary (harsh, untrained) vector
field; this shows it on the smooth field real use sees. Writes
benchmarks/results_fast_solver_trained.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from generativemodels_tpu.inferers import DiffusionInferer
from generativemodels_tpu.metrics import MultiScaleSSIMMetric
from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDIMScheduler, DPMSolverMultistepScheduler

SIZE = 128


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=3,
        in_channels=1,
        out_channels=1,
        num_res_blocks=1,
        num_channels=(32, 64, 128),
        attention_levels=(False, False, True),
        num_head_channels=64,
        norm_num_groups=32,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    fn = lambda x, t, context=None: model.apply(variables, x, t)
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    def run(scheduler, label, runs=3):
        inferer = DiffusionInferer(scheduler)
        sample = jax.jit(lambda n, k: inferer.sample(n, fn, key=k))
        t0 = time.time()
        img = sample(noise, jax.random.PRNGKey(2))
        float(jnp.sum(img))  # host fetch: sync through the tunnel
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(runs):
            img = sample(noise, jax.random.PRNGKey(2))  # same key: same ODE endpoint
        float(jnp.sum(img))
        per_sample = (time.time() - t0) / runs
        return img, {
            "solver": label,
            "steps": int(len(scheduler.timesteps)),
            "samples_per_min": round(60.0 / per_sample, 3),
            "seconds_per_sample": round(per_sample, 2),
            "compile_s": round(compile_s, 1),
        }

    rows = []

    ddim200 = DDIMScheduler(num_train_timesteps=1000, clip_sample=False)
    ddim200.set_timesteps(200)
    ref_img, row = run(ddim200, "ddim_200_reference", runs=1)
    rows.append(row)
    print(row, flush=True)

    ms_ssim = MultiScaleSSIMMetric(spatial_dims=3, data_range=2.0, weights=(0.447, 0.2856, 0.3001))
    ref32 = ref_img.astype(jnp.float32)

    def agreement(img):
        return round(float(jnp.mean(ms_ssim(img.astype(jnp.float32), ref32))), 4)

    ddim50 = DDIMScheduler(num_train_timesteps=1000, clip_sample=False)
    ddim50.set_timesteps(50)
    img, row = run(ddim50, "ddim_50_headline")
    row["ms_ssim_vs_ddim200"] = agreement(img)
    rows.append(row)
    print(row, flush=True)

    for steps in (10, 15, 20):
        sch = DPMSolverMultistepScheduler(num_train_timesteps=1000)
        sch.set_timesteps(steps)
        img, row = run(sch, f"dpmsolver++_2m_{steps}")
        row["ms_ssim_vs_ddim200"] = agreement(img)
        rows.append(row)
        print(row, flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_fast_solver.json")
    with open(out, "w") as f:
        json.dump(
            {
                "rows": rows,
                "backend": jax.default_backend(),
                "config": "3D UNet(32,64,128) bf16, 128^3 (bench_3d_ddim.py config)",
            },
            f,
            indent=1,
        )
    print(f"wrote {out}")


def main_trained() -> None:
    import optax

    from generativemodels_tpu.parallel import init_train_state, make_diffusion_train_step
    from generativemodels_tpu.networks.schedulers import DDPMScheduler
    from generativemodels_tpu.recipes.train_2d_ddpm import synthetic_batch

    batch, size, train_steps = 64, 64, 300
    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(64, 128, 128), attention_levels=(False, True, True),
        num_head_channels=128, norm_num_groups=32, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((batch, 1, size, size))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((batch,), jnp.int32))
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, DDPMScheduler(num_train_timesteps=1000), tx)
    state = init_train_state(variables["params"], tx)
    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    for i in range(train_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = synthetic_batch(k_data, batch, size) * 2 - 1
        state, loss = step(state, images, k_step)
    print(f"trained {train_steps} steps in {time.time() - t0:.0f}s, "
          f"loss {float(loss):.4f}", flush=True)

    fn = lambda xx, tt, context=None: apply(state.params, xx, tt)
    noise = jax.random.normal(jax.random.PRNGKey(7), (8, 1, size, size))
    ms_ssim = MultiScaleSSIMMetric(spatial_dims=2, data_range=2.0,
                                   weights=(0.447, 0.2856, 0.3001))

    def run(scheduler, label):
        inferer = DiffusionInferer(scheduler)
        sample = jax.jit(lambda n, k: inferer.sample(n, fn, key=k))
        img = sample(noise, jax.random.PRNGKey(2))
        float(jnp.sum(img))
        t0 = time.time()
        img = sample(noise, jax.random.PRNGKey(2))
        float(jnp.sum(img))
        return img.astype(jnp.float32), {
            "solver": label,
            "steps": int(len(scheduler.timesteps)),
            "seconds_per_batch8": round(time.time() - t0, 3),
        }

    rows = []
    ddim200 = DDIMScheduler(num_train_timesteps=1000, clip_sample=False)
    ddim200.set_timesteps(200)
    ref, row = run(ddim200, "ddim_200_reference")
    rows.append(row)
    print(row, flush=True)

    battery = [("ddim_50", DDIMScheduler(num_train_timesteps=1000, clip_sample=False), 50)]
    for steps in (10, 15, 20):
        battery.append(
            (f"dpmsolver++_2m_{steps}", DPMSolverMultistepScheduler(num_train_timesteps=1000), steps)
        )
    for label, sch, steps in battery:
        sch.set_timesteps(steps)
        img, row = run(sch, label)
        row["ms_ssim_vs_ddim200"] = round(float(jnp.mean(ms_ssim(img, ref))), 4)
        row["mae_vs_ddim200"] = round(float(jnp.abs(img - ref).mean()), 4)
        rows.append(row)
        print(row, flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_fast_solver_trained.json"
    )
    with open(out, "w") as f:
        json.dump(
            {
                "rows": rows,
                "backend": jax.default_backend(),
                "config": f"TRAINED 2D UNet(64,128,128) bf16 {size}px, "
                          f"{train_steps} steps on synthetic blobs, sample batch 8",
            },
            f,
            indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    if "--trained" in sys.argv:
        main_trained()
    else:
        main()
