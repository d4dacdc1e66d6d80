"""Selective-remat variants of the 3D 128^3 train step (round 4).

The HLO-correlated train profile (results_3d_train_hlo.json) shows ~59%
of the step's device time in 32k-seq flash-attention custom calls, and
whole-model remat (`use_checkpointing=True`) re-runs every attention
forward inside the backward pass (the fwd-with-stats recompute rows).
Attention lives at level 2 (32^3), where activations are small — so
exempting deep levels from remat trades a few hundred MB of residency
for the whole attention (and level-2 conv) recompute.

Variants (per-level use_checkpointing, (lvl0, lvl1, lvl2)):
  TTT — reference-parity full remat (bench_3d_train baseline)
  TTF — keep level-2 (attention) activations resident
  TFF — also keep level-1
  FFF — no remat (measures the pure recompute tax; may OOM)

Writes benchmarks/results_3d_remat.json.
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


def run_variant(ckpt, steps: int = 10, batch: int = 1):
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
        use_checkpointing=ckpt,
    )
    x = jnp.zeros((batch, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)

    images = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
    rng = jax.random.PRNGKey(2)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    return steps / (time.time() - t0)


def main() -> None:
    rows = []
    for label, ckpt, batch in [
        ("TTT", True, 1),
        ("TTF", (True, True, False), 1),
        ("TFF", (True, False, False), 1),
        ("FFF", False, 1),
        # round-3's "batch 1 is optimal" probe ran WITH remat; re-check the
        # batch economics now that remat is off (bh=2 -> 4 in attention)
        ("FFF_b2", False, 2),
        ("TFF_b2", (True, False, False), 2),
    ]:
        try:
            sps = run_variant(ckpt, batch=batch)
            rows.append({"variant": label, "batch": batch,
                         "steps_per_s": round(sps, 3),
                         "vols_per_s": round(sps * batch, 3)})
        except Exception as exc:  # OOM expected for the tail variants
            rows.append({"variant": label, "batch": batch,
                         "error": str(exc)[:300]})
        print(rows[-1], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_3d_remat.json")
    with open(out, "w") as f:
        json.dump({"config": "3D UNet(32,64,128) bf16 b1 128^3",
                   "rows": rows, "backend": jax.default_backend()}, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
