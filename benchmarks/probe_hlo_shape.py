"""Identify which model op produces a given HLO shape in the 3D sampler.

Compiles the same 128^3 DDIM sampler as profile_3d_hlo.py, then prints
every instruction whose output shape matches the query, with its
`metadata op_name` (the JAX source trace) — the fast way to attribute a
hot-but-opaque profile row back to a model module.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from generativemodels_tpu.inferers import DiffusionInferer
from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDIMScheduler

SIZE = 128
QUERY = sys.argv[1] if len(sys.argv) > 1 else "128,128,8,18,64"


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
    scheduler.set_timesteps(50)
    inferer = DiffusionInferer(scheduler)
    fn = lambda xx, t, context=None: model.apply(variables, xx, t)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    hlo = sample.lower(noise, jax.random.PRNGKey(2)).compile().as_text()

    seen = 0
    for line in hlo.splitlines():
        if QUERY not in line:
            continue
        m = re.search(r"%([\w.-]+) = (\S+?\[[^\]]*\][^ ]*) ([\w-]+)\(", line)
        meta = re.search(r'op_name="([^"]+)"', line)
        if m:
            print(f"{m.group(3):14s} {m.group(1):34s} {m.group(2)[:70]}")
            if meta:
                print(f"    {meta.group(1)[:160]}")
            seen += 1
        if seen > 40:
            break
    print(f"-- {seen} instructions matched '{QUERY}'")


if __name__ == "__main__":
    main()
