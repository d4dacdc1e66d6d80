"""Dispatch-gap probe for the 3D 128^3 train step (round-5 VERDICT item 7).

The HLO profile attributes ~165 ms of device time per step
(results_3d_train_hlo.json total_ms) but the python-loop bench measures
3.67 steps/s = 273 ms/step — a ~100 ms/step gap that can only be host
work and per-call dispatch (this environment reaches the chip through a
tunnel at ~30 ms/dispatch; on a local host the gap should be smaller but
nonzero). If real, the fix is not kernel work at all: the production
loop should run K optimizer steps per dispatch inside one lax.scan
(`parallel.make_multi_step_train`, shipped since round 3), amortising
dispatch to K steps.

Measures, same config as bench.py's 3d_128_train_steps_per_sec:
  a) python-loop steps/s (one step() call per step — the bench method)
  b) multi-step scan steps/s at K=4 and K=8 (one call per K steps;
     the stacked (K, B, 1, S, S, S) batch is staged on device first,
     so the comparison isolates dispatch, not H2D)
Writes benchmarks/results_3d_train_dispatch.json.
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
from generativemodels_tpu.parallel import (
    init_train_state,
    make_diffusion_train_step,
    make_multi_step_train,
)

SIZE = 128
STEPS = 16


def build():
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
        use_checkpointing=False,
    )
    x = jnp.zeros((1, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    return apply, scheduler, tx, variables["params"]


def main() -> None:
    apply, scheduler, tx, params = build()
    results = {}

    # a) python loop (bench.py method); fresh param copies per variant —
    # the donated step deletes its input state's buffers
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(jax.tree.map(jnp.copy, params), tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, SIZE, SIZE, SIZE))
    rng = jax.random.PRNGKey(2)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    t0 = time.time()
    for _ in range(STEPS):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    results["python_loop_steps_per_sec"] = round(STEPS / (time.time() - t0), 3)

    # b) K-step scan (production loop: K optimizer steps per dispatch)
    for k in (4, 8):
        multi = make_multi_step_train(apply, scheduler, tx, steps_per_call=k)
        mstate = init_train_state(jax.tree.map(jnp.copy, params), tx)
        stacked = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(3), (k, 1, 1, SIZE, SIZE, SIZE))
        )
        mstate, losses = multi(mstate, stacked, jax.random.PRNGKey(4))  # compile
        losses.block_until_ready()
        calls = max(2, STEPS // k)
        rng = jax.random.PRNGKey(5)
        t0 = time.time()
        for _ in range(calls):
            rng, sub = jax.random.split(rng)
            mstate, losses = multi(mstate, stacked, sub)
        losses.block_until_ready()
        results[f"scan_k{k}_steps_per_sec"] = round(
            calls * k / (time.time() - t0), 3
        )

    results["config"] = "3D UNet(32,64,128) bf16 b1 128^3 no-remat"
    results["backend"] = jax.default_backend()
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_3d_train_dispatch.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
