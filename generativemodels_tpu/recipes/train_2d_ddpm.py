"""Runnable 2D DDPM training recipe (MedNIST-tutorial equivalent).

Reference parity: tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py (model
config :166-177, training loop :196-233) rebuilt TPU-first: one jitted,
donated train step; sampling as a single lax.scan; optional data-parallel
mesh. Runs on synthetic data by default (no dataset downloads in this
environment); pass `--data-dir` with .npy images for real data.

Usage: python -m generativemodels_tpu.recipes.train_2d_ddpm --steps 100
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from ..inferers import DiffusionInferer
from ..networks.nets import DiffusionModelUNet
from ..networks.schedulers import DDPMScheduler
from ..parallel import create_mesh, init_train_state, make_diffusion_train_step, shard_batch, shard_params
from ..utils import CheckpointManager, StepTimer
from ..utils import enable_persistent_compilation_cache


def synthetic_batch(key, batch: int, size: int) -> jnp.ndarray:
    """Random blob images in [0, 1] (stand-in for MedNIST)."""
    k1, k2 = jax.random.split(key)
    xy = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, size), jnp.linspace(-1, 1, size)), -1)
    centers = jax.random.uniform(k1, (batch, 1, 1, 2), minval=-0.5, maxval=0.5)
    radii = jax.random.uniform(k2, (batch, 1, 1), minval=0.2, maxval=0.6)
    d = jnp.linalg.norm(xy[None] - centers, axis=-1)
    return jnp.clip(1.0 - d / radii, 0, 1)[:, None, :, :]


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=2.5e-5)
    parser.add_argument("--channels", type=int, nargs="+", default=[128, 256, 256])
    parser.add_argument("--norm-groups", type=int, default=32)
    parser.add_argument("--prediction-type", choices=["epsilon", "v_prediction"],
                        default="epsilon",
                        help="training target; v_prediction mirrors "
                        "2d_ddpm_tutorial_v_prediction.py")
    parser.add_argument("--data-parallel", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host pod run: jax.distributed.initialize "
                        "via parallel.initialize_multihost, per-host file "
                        "partitioning, global-batch assembly; run the SAME "
                        "command on every host (docs/MULTIHOST.md)")
    parser.add_argument("--data-dir", type=str, default=None,
                        help=".nii/.nii.gz/.npy directory; synthetic blobs if omitted")
    parser.add_argument("--fit", choices=["crop_pad", "resize", "none"],
                        default="crop_pad",
                        help="fit real-size samples to --size: center crop/zero-pad, interpolating resize, or none (shapes must already match)")
    parser.add_argument("--augment", action="store_true",
                        help="tutorial-default RandAffine augmentation (rotate ±5°, "
                        "translate ±1px, scale ±5%%, prob 0.5)")
    parser.add_argument("--cache", action="store_true",
                        help="decode+fit once and cache samples in host RAM "
                        "(reference CacheDataset)")
    parser.add_argument("--accumulate", type=int, default=1,
                        help="gradient-accumulation microbatches per optimizer "
                        "update (batch must divide evenly)")
    parser.add_argument("--checkpoint-dir", type=str, default=None)
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="maintain an EMA of the params (e.g. 0.9999); "
                        "sampling and the saved checkpoint then use the EMA "
                        "weights (beyond reference — standard diffusion practice)")
    parser.add_argument("--sample", action="store_true", help="sample after training")
    args = parser.parse_args()

    if args.multihost:
        from ..parallel import initialize_multihost

        pid, pcount = initialize_multihost()  # before any device queries
    else:
        pid, pcount = 0, 1
    is_main = pid == 0

    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=tuple(args.channels),
        attention_levels=(False,) + (True,) * (len(args.channels) - 1),
        num_head_channels=args.channels[-1],
        norm_num_groups=args.norm_groups,
    )
    scheduler = DDPMScheduler(
        num_train_timesteps=1000, prediction_type=args.prediction_type
    )
    tx = optax.adam(args.lr)

    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32))
    apply = lambda p, x, t: model.apply({"params": p}, x, t)

    mesh = (
        create_mesh({"data": jax.device_count()})  # global devices on a pod
        if (args.data_parallel or args.multihost)
        else None
    )
    step = make_diffusion_train_step(
        apply, scheduler, tx, mesh=mesh, prediction_target=args.prediction_type,
        accumulate_steps=args.accumulate, ema_decay=args.ema_decay,
    )
    params = shard_params(variables["params"], mesh) if mesh else variables["params"]
    state = init_train_state(params, tx, ema=args.ema_decay is not None)

    mgr = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir else None
    timer = StepTimer(warmup=2)
    rng = jax.random.PRNGKey(42)

    data_iter = None
    if args.data_dir and args.multihost:
        from ..data import multihost_device_batches

        # --batch is the GLOBAL batch; each host decodes only its own
        # file partition and contributes batch/process_count samples
        data_iter = multihost_device_batches(
            args.data_dir, (args.size,) * 2, args.batch, mesh, args.fit,
            cache=args.cache, augment=args.augment,
        )
    elif args.data_dir:
        from ..data import device_batches

        data_iter = device_batches(
            args.data_dir, (args.size,) * 2, args.batch, args.fit,
            cache=args.cache, augment=args.augment,
        )

    for i in range(args.steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        if data_iter is not None:
            images = next(data_iter) * 2 - 1
        elif args.multihost:
            from ..parallel import assemble_global_batch

            local = synthetic_batch(
                jax.random.fold_in(k_data, pid), args.batch // pcount, args.size
            ) * 2 - 1
            images = assemble_global_batch(local, mesh)
        else:
            images = synthetic_batch(k_data, args.batch, args.size) * 2 - 1
        if mesh and not args.multihost:
            images = shard_batch(images, mesh)
        state, loss = step(state, images, k_step)
        timer.tick()
        if (i + 1) % 20 == 0 and is_main:
            sps = timer.steps_per_sec
            print(f"step {i + 1}/{args.steps} loss={float(loss):.4f}"
                  + (f" {sps:.2f} steps/s" if sps else ""))
    # EMA weights (when tracked) are what checkpoints and sampling consume
    final_params = state.ema_params if args.ema_decay is not None else state.params
    if mgr:
        mgr.save(int(state.step), {"params": final_params, "step": state.step})
        if is_main:
            print(f"checkpoint saved at step {int(state.step)}"
                  + (" (EMA weights)" if args.ema_decay is not None else ""))

    if args.sample and pcount > 1:
        if is_main:
            print("--sample is a single-host path; sample from the saved "
                  "checkpoint instead (recipes/serve.py)")
    elif args.sample:
        inferer = DiffusionInferer(scheduler)
        scheduler.set_timesteps(1000)
        fn = lambda x, t, context=None: apply(final_params, x, t)
        t0 = time.time()
        img = inferer.sample(
            jax.random.normal(jax.random.PRNGKey(7), (1, 1, args.size, args.size)),
            fn, key=jax.random.PRNGKey(8),
        )
        img.block_until_ready()
        print(f"1000-step sample in {time.time() - t0:.1f}s, "
              f"range [{float(img.min()):.3f}, {float(img.max()):.3f}]")


if __name__ == "__main__":
    main()
