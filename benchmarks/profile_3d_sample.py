"""On-chip profile of 3D 128^3 DDIM-50 sampling (the BASELINE north-star).

Captures a jax.profiler trace of one scan-compiled DDIM-50 sample at the
bench_3d_ddim.py config, decodes the device timeline with
tools/xplane_summary.device_breakdown, and reports measured utilisation:
busy fraction, FLOP rate over the busy window, and the op-category
decomposition that says where the next kernel effort should go.

Prints one JSON line and writes benchmarks/results_3d_profile.json.
"""
from __future__ import annotations

import glob
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import xplane_summary

SIZE = 128
STEPS = 50
V5E_BF16_PEAK = 197e12


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDIMScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(STEPS)
    inferer = DiffusionInferer(scheduler)
    fn = lambda x, t, context=None: model.apply(variables, x, t)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    img = sample(noise, jax.random.PRNGKey(2))
    float(jnp.sum(img))  # compile + true host sync (tunnel)

    lowered = sample.lower(noise, jax.random.PRNGKey(2)).compile()
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca["flops"]) if ca and "flops" in ca else None

    trace_dir = "/tmp/xprof_3d_sample"
    with jax.profiler.trace(trace_dir):
        img = sample(noise, jax.random.PRNGKey(3))
        float(jnp.sum(img))

    t0 = time.time()
    img = sample(noise, jax.random.PRNGKey(4))
    float(jnp.sum(img))
    wall = time.time() - t0

    path = max(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime,
    )
    bd = xplane_summary.device_breakdown(path)
    busy = bd["compute_busy_ps"] / 1e12
    total_cat = sum(bd["cats"].values()) or 1
    result = {
        "metric": "3d_128_ddim_profile",
        "busy_s_per_sample": round(busy, 3),
        "wall_s_per_sample": round(wall, 3),
        "busy_fraction": round(busy / wall, 3),
        "async_dma_s": round(bd["async_union_ps"] / 1e12, 3),
        "flops_per_sample": flops,
        "flop_rate_busy_pct_peak": (
            round(flops / busy / V5E_BF16_PEAK * 100, 1) if flops else None
        ),
        "op_time_pct": {
            k: round(v / total_cat * 100, 1)
            for k, v in sorted(bd["cats"].items(), key=lambda kv: -kv[1])
        },
        "top_ops_pct": {
            k: round(v / total_cat * 100, 1) for k, v in bd["top_ops"].items()
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "results_3d_profile.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
