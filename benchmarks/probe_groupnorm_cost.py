"""Upper-bound probe: what would a zero-cost GroupNorm buy?

The 3D 128^3 DDIM profile (results_3d_profile.json) attributes ~35% of
sample time to GroupNorm statistics/apply fusions and the padded-layout
select/copy ops around them. Before building a fused Pallas GroupNorm,
measure the ceiling: monkeypatch flax.linen.GroupNorm with a stats-free
per-channel affine (same parameter structure, no reductions) and re-time
the exact bench_3d_ddim.py config. The delta is the most ANY GroupNorm
kernel could recover (the affine still reads/writes the tensor once).

Not a correctness config — a roofline probe only.
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

import flax.linen as nn
import jax.numpy as jnp


class AffineOnlyGroupNorm(nn.Module):
    """Parameter-compatible stand-in: scale/bias, no statistics."""

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype | None = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (c,)).astype(x.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,)).astype(x.dtype)
        return y


def main() -> None:
    nn.GroupNorm = AffineOnlyGroupNorm  # monkeypatch before model import

    from generativemodels_tpu.inferers import DiffusionInferer
    from generativemodels_tpu.networks.nets import DiffusionModelUNet
    from generativemodels_tpu.networks.schedulers import DDIMScheduler

    SIZE, STEPS = 128, 50
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

    t0 = time.time()
    img = sample(noise, jax.random.PRNGKey(2))
    float(jnp.sum(img))
    compile_s = time.time() - t0

    runs = 3
    t0 = time.time()
    for i in range(runs):
        img = sample(noise, jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))
    per_sample = (time.time() - t0) / runs

    print(json.dumps({
        "metric": "3d_128_ddim_affine_norm_probe",
        "seconds_per_sample": round(per_sample, 3),
        "samples_per_min": round(60.0 / per_sample, 3),
        "compile_s": round(compile_s, 1),
        "baseline_seconds_per_sample": 8.04,
        "note": "GroupNorm replaced by per-channel affine; ceiling for any GN kernel",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
