"""3D 128^3 DDIM sampling throughput (the BASELINE north-star metric).

Direct 3D diffusion at 128^3 with a memory-feasible UNet in bf16, DDIM-50
sampling compiled into one lax.scan. Prints one JSON line:
{"metric": "3d_128_ddim_samples_per_min", ...}.
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
from generativemodels_tpu.networks.schedulers import DDIMScheduler

SIZE = 128
STEPS = 50


def main() -> None:
    if "--fused" in sys.argv:
        # route interior 3D ResnetBlocks through the fused Pallas kernel
        os.environ["GMTPU_FUSED_RESBLOCK"] = "1"
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
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDIMScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(STEPS)
    inferer = DiffusionInferer(scheduler)
    fn = lambda x, t, context=None: model.apply(variables, x, t)

    sample = jax.jit(
        lambda noise, key: inferer.sample(noise, fn, key=key)
    )
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    t0 = time.time()
    img = sample(noise, jax.random.PRNGKey(2))
    float(jnp.sum(img))  # host fetch: block_until_ready does not sync through the tunnel
    compile_s = time.time() - t0

    runs = 3
    t0 = time.time()
    for i in range(runs):
        img = sample(noise, jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))
    per_sample = (time.time() - t0) / runs
    samples_per_min = 60.0 / per_sample

    print(json.dumps({
        "metric": "3d_128_ddim_samples_per_min",
        "value": round(samples_per_min, 3),
        "unit": "samples/min",
        "seconds_per_sample": round(per_sample, 2),
        "ddim_steps": STEPS,
        "compile_s": round(compile_s, 1),
        "config": "3D UNet(32,64,128) bf16, 128^3, DDIM-50"
                  + (" fused-resblock" if "--fused" in sys.argv else ""),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
