"""Identify + attack the 2D train step's non-matmul time (VERDICT r3 item 4).

results_mfu.json: 57.3% wall MFU with 39.6% of device time in
elementwise/reduce fusions and 14.9% in one `%convert_reduce_fusion`.
This probe (a) dumps the actual HLO bodies of the convert_reduce fusions
so the slice is attributable, and (b) times A/B variants of the step:

  base      — bench.py config exactly (flash attention, adam, bf16 acts)
  einsum    — flash kernel disabled (einsum attention; is the custom call
              + its bwd worth its time at S=1024/256, d=256 in training?)
  f32_temb  — no variant; placeholder documented below
  fused_adam— optax.adam -> inject-hyperparam'd adam (single fused tree)

Writes benchmarks/results_2d_train_levers.json.
"""
from __future__ import annotations

import json
import os
import re
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

BATCH = 128
SIZE = 64


def build(use_flash: bool | None = None, tx=None):
    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(128, 256, 256), attention_levels=(False, True, True),
        num_head_channels=256, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((BATCH, 1, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((BATCH,), jnp.int32)
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = tx or optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)
    return step, state


def time_step(step, state, iters=30):
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 1, SIZE, SIZE))
    state, loss = step(state, images, jax.random.PRNGKey(2))
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = step(state, images, jax.random.PRNGKey(3 + i))
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt, state


def dump_convert_reduce(step, state):
    """Summarise every instruction NAMED %convert_reduce_fusion.* — the
    instruction name (not the called computation's) is what the xplane
    trace aggregates under, so this is the 14.9% slice's identity."""
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 1, SIZE, SIZE))
    hlo = step.lower(state, images, jax.random.PRNGKey(2)).compile().as_text()
    from collections import Counter

    bodies = []
    for m in re.finditer(
        r"^\s*(%convert_reduce_fusion[.\w]*) = (.*?) fusion\(.*calls=(%[\w.]+)",
        hlo, re.M,
    ):
        name, shape, comp = m.groups()
        cm = re.search(
            r"\n%?" + re.escape(comp.lstrip("%")) + r"[^\n]*\{\n(.*?)\n\}",
            hlo, re.S,
        )
        ops = Counter(re.findall(r"= \S+ ([\w-]+)\(", cm.group(1))) if cm else {}
        bodies.append({"name": name, "shape": shape[:90], "ops": dict(ops)})
    return bodies


def main() -> None:
    out = {"metric": "2d_train_levers", "batch": BATCH, "size": SIZE,
           "variants": {}}

    # --- base ---
    step, state = build()
    sps, state = time_step(step, state)
    out["variants"]["base"] = round(sps, 3)
    out["convert_reduce_bodies"] = dump_convert_reduce(step, state)
    print("base:", sps, "steps/s")
    for b in out["convert_reduce_bodies"]:
        print("  ", b)

    # --- einsum attention (flash off) ---
    from generativemodels_tpu.ops import attention as attn_mod
    saved = attn_mod._FLASH_MIN_SEQ
    attn_mod._FLASH_MIN_SEQ = 1 << 30
    try:
        step2, state2 = build()
        sps2, _ = time_step(step2, state2)
        out["variants"]["einsum_attention"] = round(sps2, 3)
        print("einsum:", sps2, "steps/s")
    finally:
        attn_mod._FLASH_MIN_SEQ = saved

    # --- fused adam (single-tree update via inject_hyperparams off;
    #     optax.adam already fuses per-leaf; try adamw-style scale fusion
    #     by disabling bias-correction splits: use optax.scale_by_adam
    #     + scale, identical math, to see if the update tree changes cost)
    tx3 = optax.chain(optax.scale_by_adam(), optax.scale(-2.5e-5))
    step3, state3 = build(tx=tx3)
    sps3, _ = time_step(step3, state3)
    out["variants"]["scale_by_adam_chain"] = round(sps3, 3)
    print("scale_by_adam:", sps3, "steps/s")

    # --- Adam first moment in bf16 (halves m read+write HBM traffic) ---
    step4, state4 = build(tx=optax.adam(2.5e-5, mu_dtype=jnp.bfloat16))
    sps4, _ = time_step(step4, state4)
    out["variants"]["adam_mu_bf16"] = round(sps4, 3)
    print("adam_mu_bf16:", sps4, "steps/s")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_2d_train_levers.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out)[:400])


if __name__ == "__main__":
    main()
