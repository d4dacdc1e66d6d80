"""Batched 3D 128^3 DDIM sampling throughput.

The headline metric is samples/min *per chip*; nothing pins it to
batch 1. Convs at the level-0 N=32 lane ceiling and the attention
grid both scale their useful work linearly with batch while fixed
per-step overheads (scheduler math, small-level launches, scan
bookkeeping) amortise — so if batch b costs < b× the batch-1 step,
throughput rises. This probe measures batch 1/2/4 wall time per
sample on the flagship config to decide whether the bench should
report a batched number. Writes results_3d_batch.json.
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


def bench_batch(b: int) -> dict:
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
    x = jnp.zeros((b, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x[:1], jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDIMScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(STEPS)
    inferer = DiffusionInferer(scheduler)
    fn = lambda xt, t, context=None: model.apply(variables, xt, t)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    t0 = time.time()
    img = sample(noise, jax.random.PRNGKey(2))
    float(jnp.sum(img))  # host fetch syncs through the tunnel
    compile_s = time.time() - t0

    runs = 3
    t0 = time.time()
    for i in range(runs):
        img = sample(noise, jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))
    per_call = (time.time() - t0) / runs
    per_sample = per_call / b
    return {
        "batch": b,
        "seconds_per_call": round(per_call, 3),
        "seconds_per_sample": round(per_sample, 3),
        "samples_per_min": round(60.0 / per_sample, 2),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    rows = []
    for b in (1, 2, 4):
        try:
            rows.append(bench_batch(b))
        except Exception as e:  # OOM at some batch is itself the answer
            rows.append({"batch": b, "error": repr(e)[:200]})
        print(rows[-1], flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_3d_batch.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
