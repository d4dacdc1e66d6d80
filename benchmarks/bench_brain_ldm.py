"""Brain-LDM bundle-shape sampling benchmark (output 160x224x160).

The exact workload of the reference model-zoo bundle
brain_image_synthesis_latent_diffusion_model (UNet(256,512,768) over a
(3, 20, 28, 20) latent conditioned on 4 covariates, DDIM-50, 3D AEKL
decode to 160x224x160) built from the `brain_3d_ldm` preset with random
weights — the compute cost is weight-independent, so this is the
throughput the bundle will run at once converted weights are dropped in.

Writes results_brain_ldm.json.
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
from generativemodels_tpu.recipes.brain_ldm_sampler import sample_brain_ldm

LATENT_SHAPE = (1, 3, 20, 28, 20)  # bundle latent (160/8, 224/8, 160/8)


def main() -> None:
    import argparse

    import jax.numpy as _jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", choices=["ddim", "dpmsolver"], default="ddim")
    ap.add_argument("--steps", type=int, default=None,
                    help="inference steps (default 50 ddim / 10 dpmsolver)")
    args = ap.parse_args()
    steps = args.steps or (10 if args.solver == "dpmsolver" else 50)

    parser = load_preset("brain_3d_ldm")
    # the preset mirrors the bundle's concat+crossattn conditioning
    # (in_channels = latent+4); recipes/brain_ldm_sampler.py feeds the
    # covariates through cross-attention only, so init for a 3ch input.
    # bf16 compute = the TPU flagship precision (bundle runs AMP on GPU).
    unet = parser.resolve("network").clone(
        in_channels=LATENT_SHAPE[1], dtype=_jnp.bfloat16
    )
    aekl = parser.resolve("autoencoder").clone(dtype=_jnp.bfloat16)
    scheduler = parser.resolve("scheduler")
    if args.solver == "dpmsolver":
        # same trained field (bundle beta schedule), fast ODE solver
        from generativemodels_tpu.networks.schedulers import (
            DPMSolverMultistepScheduler,
        )

        scheduler = DPMSolverMultistepScheduler(
            num_train_timesteps=1000, schedule="scaled_linear_beta",
            beta_start=0.0015, beta_end=0.0205,
        )

    x_unet = jnp.zeros((1, LATENT_SHAPE[1], *LATENT_SHAPE[2:]))
    ctx = jnp.zeros((1, 1, 4))
    t0 = time.time()
    unet_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(0), x_unet, jnp.zeros((1,), jnp.int32), context=ctx
    )
    aekl_vars = jax.jit(aekl.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 40, 56, 40))
    )
    init_s = time.time() - t0

    # params enter as jit ARGUMENTS — closing over them bakes ~2 GB of
    # weights into the program as constants and bloats the compile
    def _sample(uv, av, key):
        def unet_fn(x, t, context=None):
            return unet.apply(uv, x, t, context=context)

        class BoundAekl:
            def decode_stage_2_outputs(self, z):
                return aekl.apply(av, z, method=aekl.decode_stage_2_outputs)

        return sample_brain_ldm(
            unet_fn, BoundAekl(), scheduler, LATENT_SHAPE,
            gender=0.0, age=0.5, ventricular_vol=0.2, brain_vol=0.6,
            num_inference_steps=steps, key=key,
        )

    jitted = jax.jit(_sample)
    sample = lambda key: jitted(unet_vars, aekl_vars, key)

    t0 = time.time()
    img = sample(jax.random.PRNGKey(2))
    float(jnp.sum(img))  # compile + true sync
    compile_s = time.time() - t0

    runs = 3
    t0 = time.time()
    for i in range(runs):
        img = sample(jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))
    per_sample = (time.time() - t0) / runs

    result = {
        "metric": f"brain_ldm_bundle_{args.solver}{steps}_samples_per_min",
        "value": round(60.0 / per_sample, 2),
        "seconds_per_sample": round(per_sample, 3),
        "out_shape": list(img.shape),
        "solver": args.solver, "steps": steps,
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "config": "zoo bundle config: UNet(256,512,768) @ (3,20,28,20) latent + AEKL(64,128,128,128) decode to 160x224x160",
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "results_brain_ldm.json" if args.solver == "ddim" else "results_brain_ldm_dpm.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
