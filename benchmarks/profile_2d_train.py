"""On-chip profile of the flagship 2D DDPM train step -> measured MFU.

Captures a jax.profiler trace of the bench.py 2D train config on the real
chip, then decodes the xplane with tools/xplane_summary.py's parser to get
  - device busy time per step (union of XLA-op intervals, dispatch gaps
    excluded -> a *measured* step time, independent of tunnel latency),
  - the matmul/conv vs other-op decomposition of that busy time.

MFU = step FLOPs (XLA cost analysis of the compiled module) / busy time
/ peak. Prints one JSON line and appends to benchmarks/results_mfu.json.
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import xplane_summary

BATCH, SIZE = 128, 64
V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s


def build_step():
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
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)
    return step, state


def op_breakdown(trace_dir: str):
    """Decode the xplane into (compute_busy_ps, async_dma_union_ps, cats, top).

    Delegates to xplane_summary.device_breakdown, which keeps the "XLA
    Ops" compute stream separate from the "Async XLA Ops" DMA spans
    (conflating them double-counts async copies as busy time).
    """
    import glob

    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise RuntimeError(f"no xplane under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    bd = xplane_summary.device_breakdown(path, categorize=categorize)
    return bd["compute_busy_ps"], bd["async_union_ps"], bd["cats"], bd["top_ops"]


def categorize(op: str) -> str:
    lo = op.lower()
    if "conv" in lo or "dot" in lo or "einsum" in lo:
        return "matmul/conv"
    if "fusion" in lo:
        return "fusion"
    if "copy" in lo or "transpose" in lo or "bitcast" in lo:
        return "copy/layout"
    if "all-reduce" in lo or "collective" in lo:
        return "collective"
    if "dynamic" in lo or "slice" in lo or "concatenate" in lo or "pad" in lo:
        return "slice/concat"
    return "other"


def main() -> None:
    step, state = build_step()
    images = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 1, SIZE, SIZE))
    rng = jax.random.PRNGKey(2)

    # warm/compile, with a true host sync (tunnel block_until_ready is async)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    _ = float(loss)

    # FLOPs of the compiled step from its cost analysis
    rng, sub = jax.random.split(rng)
    compiled = step.lower(state, images, sub).compile() if hasattr(step, "lower") else None
    flops = None
    if compiled is not None:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            flops = float(ca["flops"])

    trace_dir = "/tmp/xprof_2d_train"
    steps = 10
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            rng, sub = jax.random.split(rng)
            state, loss = step(state, images, sub)
        _ = float(loss)  # force completion inside the trace window

    # wall time (true-synced) for comparison
    t0 = time.time()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    _ = float(loss)
    wall_per_step = (time.time() - t0) / steps

    busy_ps, async_ps, cats, top_ops = op_breakdown(trace_dir)
    busy_per_step = busy_ps / steps / 1e12
    async_per_step = async_ps / steps / 1e12
    total_cat = sum(cats.values()) or 1
    breakdown = {
        k: round(v / total_cat * 100, 1) for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
    }

    result = {
        "metric": "2d_train_measured_mfu",
        "busy_s_per_step": round(busy_per_step, 5),
        "async_dma_s_per_step": round(async_per_step, 5),
        "wall_s_per_step": round(wall_per_step, 5),
        "steps_per_s_wall": round(1 / wall_per_step, 2),
        "flops_per_step": flops,
        "mfu_busy": round(flops / busy_per_step / V5E_BF16_PEAK, 4) if flops else None,
        "mfu_wall": round(flops / wall_per_step / V5E_BF16_PEAK, 4) if flops else None,
        "busy_fraction": round(busy_per_step / wall_per_step, 3),
        "op_time_pct": breakdown,
        "top_ops_pct": {
            k: round(v / total_cat * 100, 1) for k, v in top_ops.items()
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(__file__), "results_mfu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
