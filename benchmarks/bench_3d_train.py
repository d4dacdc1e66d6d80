"""3D 128^3 DDPM training-step throughput (bf16 + remat, batch 1).

The reference's 3D DDPM tutorial needs ~21 GB GPU at batch 8 on
*downsampled* BraTS (tutorials/generative/3d_ddpm/3d_ddpm_tutorial.py:109);
this config trains full 128^3 on one 16 GB v5e chip. Prints one JSON line
and writes results_3d_train.json.
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
import optax

from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDPMScheduler
from generativemodels_tpu.parallel import init_train_state, make_diffusion_train_step

SIZE = 128


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
        # round 4: the round-3 conv decomposition freed enough HBM that the
        # full 128^3 b1 backward fits WITHOUT remat — and whole-model remat
        # re-ran every 32k-seq attention forward in the backward pass
        # (results_3d_train_hlo.json). Measured: remat-all 2.92 steps/s,
        # remat-level0-only 3.44, no remat 3.68 (results_3d_remat.json).
        use_checkpointing=False,
    )
    x = jnp.zeros((1, 1, SIZE, SIZE, SIZE))
    t0 = time.time()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)

    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, SIZE, SIZE, SIZE))
    rng = jax.random.PRNGKey(2)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)  # true host sync through the tunnel
    compile_s = time.time() - t0

    steps = 10
    t0 = time.time()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    sps = steps / (time.time() - t0)

    result = {
        "metric": "3d_128_train_steps_per_sec",
        "value": round(sps, 3),
        "compile_s": round(compile_s, 1),
        "batch": 1,
        "config": "3D UNet(32,64,128) bf16 no-remat 128^3",
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "results_3d_train.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
