"""Recompute the cost inputs behind benchmarks/A100_PROXY.md.

Prints one JSON line with FLOPs / bytes-accessed for the 3D 128^3 sampling
UNet forward, from XLA cost analysis on whatever backend is available
(TPU-compiled when on the chip; CPU lowering otherwise), plus the derived
A100 roofline numbers and the documented point proxy.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from generativemodels_tpu.networks.nets import DiffusionModelUNet

A100_TF32_FLOPS = 156e12
A100_HBM_BYTES = 2.0e12
DDIM_STEPS = 50
ASSUMED_EFFICIENCY = (0.10, 0.15)  # eager fp32 3D UNet fraction of TF32 peak
POINT_PROXY_SAMPLES_PER_MIN = 9.0


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 1, 128, 128, 128))
    t = jnp.zeros((1,), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    fwd = jax.jit(lambda v, xx, tt: model.apply(v, xx, tt))
    lowered = fwd.lower(variables, x, t)
    try:
        ca = lowered.compile().cost_analysis()
        kind = f"compiled:{jax.default_backend()}"
    except Exception:
        ca = lowered.cost_analysis()
        kind = f"lowered:{jax.default_backend()}"
    if isinstance(ca, list):
        ca = ca[0]
    flops_fwd = float(ca.get("flops", 0.0))
    bytes_fwd = float(ca.get("bytes accessed", 0.0))
    flops_sample = flops_fwd * DDIM_STEPS

    compute_bound_spm = 60.0 / (flops_sample / A100_TF32_FLOPS)
    lo, hi = (
        compute_bound_spm * ASSUMED_EFFICIENCY[0],
        compute_bound_spm * ASSUMED_EFFICIENCY[1],
    )
    print(json.dumps({
        "cost_analysis": kind,
        "flops_per_forward": flops_fwd,
        "bytes_per_forward": bytes_fwd,
        "flops_per_sample": flops_sample,
        "a100_tf32_compute_roofline_samples_per_min": round(compute_bound_spm, 1),
        "a100_eager_proxy_range_samples_per_min": [round(lo, 1), round(hi, 1)],
        "point_proxy_samples_per_min": POINT_PROXY_SAMPLES_PER_MIN,
        "assumptions": "see benchmarks/A100_PROXY.md",
    }))


if __name__ == "__main__":
    main()
