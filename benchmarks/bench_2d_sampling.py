"""2D sampling throughput: DDPM-1000 and DDIM-50, tutorial-scale model.

Batch-64 64x64 sampling with the bench.py 2D train model config, each
trajectory one scan-compiled program. Prints one JSON line per sampler
and writes results_2d_sampling.json.
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
from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
)

BATCH, SIZE = 64, 64


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(128, 256, 256), attention_levels=(False, True, True),
        num_head_channels=256, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((BATCH, 1, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((BATCH,), jnp.int32)
    )
    fn = lambda xx, tt, context=None: model.apply(variables, xx, tt)
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    result = {"metric": "2d_ddpm_sampling", "batch": BATCH, "size": SIZE,
              "dtype": "bf16", "backend": jax.default_backend()}
    for label, scheduler, steps in (
        ("ddpm1000", DDPMScheduler(num_train_timesteps=1000), 1000),
        ("ddim50", DDIMScheduler(num_train_timesteps=1000), 50),
        ("dpmsolver10", DPMSolverMultistepScheduler(num_train_timesteps=1000), 10),
    ):
        scheduler.set_timesteps(steps)
        inferer = DiffusionInferer(scheduler)
        sample = jax.jit(lambda n, k: inferer.sample(n, fn, key=k))
        img = sample(noise, jax.random.PRNGKey(2))
        float(jnp.sum(img))  # compile + true sync through the tunnel
        runs = 3
        t0 = time.time()
        for i in range(runs):
            img = sample(noise, jax.random.PRNGKey(3 + i))
        float(jnp.sum(img))
        per_batch = (time.time() - t0) / runs
        result[label] = {
            "samples_per_min": round(60.0 * BATCH / per_batch, 1),
            "batch_time_s": round(per_batch, 3),
        }
        print(json.dumps({label: result[label]}), flush=True)

    with open(os.path.join(os.path.dirname(__file__), "results_2d_sampling.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
