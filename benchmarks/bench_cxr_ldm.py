"""CXR-LDM zoo-bundle sampling benchmark (text-conditioned 512x512).

The workload of the reference bundle
cxr_image_synthesis_latent_diffusion_model: UNet(256,512,768) over a
(3, 64, 64) latent cross-attending a 77-token CLIP text embedding
(dim 1024), DDIM-50, 2D AEKL decode to 512x512. Random weights + random
context carry the same compute as the converted bundle. Writes
results_cxr_ldm.json.
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

from generativemodels_tpu.config import load_preset
from generativemodels_tpu.inferers import LatentDiffusionInferer

LATENT_SHAPE = (1, 3, 64, 64)  # 512 / 8


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", choices=["ddim", "dpmsolver"], default="ddim")
    ap.add_argument("--steps", type=int, default=None,
                    help="inference steps (default 50 ddim / 10 dpmsolver)")
    args = ap.parse_args()
    steps = args.steps or (10 if args.solver == "dpmsolver" else 50)

    parser = load_preset("cxr_ldm")
    unet = parser.resolve("network").clone(dtype=jnp.bfloat16)
    aekl = parser.resolve("autoencoder").clone(dtype=jnp.bfloat16)
    scheduler = parser.resolve("scheduler")
    if args.solver == "dpmsolver":
        from generativemodels_tpu.networks.schedulers import (
            DPMSolverMultistepScheduler,
        )

        scheduler = DPMSolverMultistepScheduler(
            num_train_timesteps=1000, schedule="scaled_linear_beta",
            beta_start=0.0015, beta_end=0.0205,
        )
    scale_factor = parser.resolve("scale_factor")

    ctx = jnp.zeros((1, 77, 1024))  # CLIP text embedding sequence
    x_unet = jnp.zeros(LATENT_SHAPE)
    t0 = time.time()
    unet_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(0), x_unet, jnp.zeros((1,), jnp.int32), context=ctx
    )
    aekl_vars = jax.jit(aekl.init)(jax.random.PRNGKey(1), jnp.zeros((1, 1, 64, 64)))
    init_s = time.time() - t0

    scheduler.set_timesteps(steps)
    inferer = LatentDiffusionInferer(scheduler, scale_factor=scale_factor)

    def _sample(uv, av, context, key):
        def unet_fn(x, t, context=None):
            return unet.apply(uv, x, t, context=context)

        class BoundAekl:
            def decode_stage_2_outputs(self, z):
                return aekl.apply(av, z, method=aekl.decode_stage_2_outputs)

        noise = jax.random.normal(key, LATENT_SHAPE)
        return inferer.sample(
            noise, BoundAekl(), unet_fn, conditioning=context, key=key
        )

    jitted = jax.jit(_sample)
    context = jax.random.normal(jax.random.PRNGKey(5), (1, 77, 1024)) * 0.02

    t0 = time.time()
    img = jitted(unet_vars, aekl_vars, context, jax.random.PRNGKey(2))
    float(jnp.sum(img))
    compile_s = time.time() - t0

    runs = 5
    t0 = time.time()
    for i in range(runs):
        img = jitted(unet_vars, aekl_vars, context, jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))
    per_sample = (time.time() - t0) / runs

    result = {
        "metric": f"cxr_ldm_bundle_{args.solver}{steps}_samples_per_min",
        "value": round(60.0 / per_sample, 2),
        "seconds_per_sample": round(per_sample, 3),
        "out_shape": list(img.shape),
        "solver": args.solver, "steps": steps,
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "config": "zoo bundle config: UNet(256,512,768) @ (3,64,64) latent, 77x1024 text context, AEKL decode to 512x512",
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "results_cxr_ldm.json" if args.solver == "ddim" else "results_cxr_ldm_dpm.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
