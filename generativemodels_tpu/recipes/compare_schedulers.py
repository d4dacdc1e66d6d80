"""Compare DDPM / DDIM / PNDM / DPM-Solver++ sampling from one trained model.

Reference parity: tutorials/generative/2d_ddpm/2d_ddpm_compare_schedulers.py
— train one 2D DDPM, then sample the *same* trained weights with each
scheduler at several step counts and report pairwise agreement (MS-SSIM
to the DDPM-1000 reference trajectory) and wall time. Every sampler is a
single scan-compiled program. DPM-Solver++ (2M) is beyond-reference: the
fast second-order solver that matches DDIM-50 quality in 10-20 steps.

Usage:
  python -m generativemodels_tpu.recipes.compare_schedulers --train-steps 200
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import optax

from ..inferers import DiffusionInferer
from ..metrics import MultiScaleSSIMMetric
from ..networks.nets import DiffusionModelUNet
from ..networks.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    PNDMScheduler,
)
from ..parallel import init_train_state, make_diffusion_train_step
from ..utils import enable_persistent_compilation_cache
from .eval_quality import ms_ssim_weights_for
from .train_2d_ddpm import synthetic_batch


def sample_with(scheduler_cls, kwargs, steps, fn, noise, key):
    scheduler = scheduler_cls(num_train_timesteps=1000, **kwargs)
    scheduler.set_timesteps(steps)
    inferer = DiffusionInferer(scheduler)
    sample = jax.jit(lambda n, k: inferer.sample(n, fn, key=k))
    img = sample(noise, key)  # compile
    jax.block_until_ready(img)
    t0 = time.time()
    img = sample(noise, key)
    jax.block_until_ready(img)
    return img, time.time() - t0


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--sample-batch", type=int, default=8)
    parser.add_argument("--step-counts", type=int, nargs="+", default=[25, 50, 100])
    parser.add_argument("--channels", type=int, nargs="+", default=[64, 128, 128])
    parser.add_argument("--norm-groups", type=int, default=32)
    parser.add_argument("--out", type=str, default="scheduler_comparison.json")
    args = parser.parse_args()

    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=tuple(args.channels),
        attention_levels=(False,) + (True,) * (len(args.channels) - 1),
        num_head_channels=args.channels[-1], norm_num_groups=args.norm_groups,
    )
    train_scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32)
    )
    apply = lambda p, x, t: model.apply({"params": p}, x, t)
    step = make_diffusion_train_step(apply, train_scheduler, tx, donate=False)
    state = init_train_state(variables["params"], tx)

    rng = jax.random.PRNGKey(42)
    for i in range(args.train_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = synthetic_batch(k_data, args.batch, args.size) * 2 - 1
        state, loss = step(state, images, k_step)
    print(f"trained {args.train_steps} steps, final loss {float(loss):.4f}")

    fn = lambda x, t, context=None: apply(state.params, x, t)
    noise = jax.random.normal(
        jax.random.PRNGKey(7), (args.sample_batch, 1, args.size, args.size)
    )
    key = jax.random.PRNGKey(11)

    reference, ref_s = sample_with(DDPMScheduler, {}, 1000, fn, noise, key)
    ms_ssim = MultiScaleSSIMMetric(
        spatial_dims=2, data_range=2.0, weights=ms_ssim_weights_for(args.size)
    )

    results = [{"scheduler": "DDPM", "steps": 1000, "seconds": round(ref_s, 3),
                "ms_ssim_vs_ref": 1.0}]
    for steps in args.step_counts:
        for name, cls, kwargs in (
            ("DDPM", DDPMScheduler, {}),
            ("DDIM", DDIMScheduler, {}),
            ("PNDM", PNDMScheduler, {"skip_prk_steps": True}),
            ("DPM-Solver++", DPMSolverMultistepScheduler, {}),
        ):
            img, secs = sample_with(cls, kwargs, steps, fn, noise, key)
            agreement = float(jnp.mean(ms_ssim(img, reference)))
            rec = {"scheduler": name, "steps": steps, "seconds": round(secs, 3),
                   "ms_ssim_vs_ref": round(agreement, 4)}
            results.append(rec)
            print(json.dumps(rec))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
