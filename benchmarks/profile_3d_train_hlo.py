"""HLO-correlated profile of the 3D 128^3 train step (VERDICT r3 item 4).

The 3D train step (bench_3d_train.py config: UNet(32,64,128), bf16,
remat, depth-decomposed convs, batch 1) stands at ~2.9 steps/s with no
profile at all — the sampler got six rounds of HLO-driven wins, training
got none. Reuses the trace/HLO cross-referencing from profile_3d_hlo.py
to attribute device time to conv / attention / GN-backward / optimizer /
remat-recompute slices.

Writes benchmarks/results_3d_train_hlo.json.
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
        # round 4: match the official bench config (remat off — the remat
        # tax was the round-4 +26% win; this profile now tracks the
        # no-remat step with the backward-ilv dispatch active)
        use_checkpointing=False,
    )
    x = jnp.zeros((1, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)

    images = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
    state, loss = step(state, images, jax.random.PRNGKey(2))  # compile + warm
    float(loss)

    compiled = step.lower(state, images, jax.random.PRNGKey(2)).compile()
    hlo = compiled.as_text()

    trace_dir = "/tmp/xprof_3d_train_hlo"
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            state, loss = step(state, images, jax.random.PRNGKey(3 + i))
        float(loss)

    path = max(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime,
    )
    from profile_3d_hlo import annotate, top_ops_full

    ops, _ = top_ops_full(path, top=45)
    inner_total = sum(d for n, d in ops if not n.startswith("%while")) or 1

    rows = []
    for name, dur in ops:
        if name.startswith("%while"):
            continue
        info = annotate(hlo, name.split(" ")[0])
        rows.append({
            "op": name if len(name) < 120 else name.split(" ")[0],
            "pct": round(dur / inner_total * 100, 2),
            **info,
        })
    result = {"rows": rows[:35], "total_ms": round(inner_total / 1e9 / 3, 2)}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_3d_train_hlo.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    for r in rows[:20]:
        print(r.get("pct"), str(r.get("op"))[:60], str(r.get("shape"))[:70],
              r.get("body_ops"))


if __name__ == "__main__":
    main()
