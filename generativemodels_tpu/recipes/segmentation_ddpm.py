"""Image-to-image translation recipe: segmentation with DDPMs.

Reference parity: tutorials/generative/image_to_image_translation/
tutorial_segmentation_with_ddpm.py — a DDPM over segmentation masks whose
every denoising step is conditioned by concatenating the source image into
the channel dim (in_channels=2, :170-189, concat at :220-226). Sampling the
reverse loop repeatedly with the same image yields an implicit segmentation
ensemble whose variance is an uncertainty map (:247-299). The same
structure performs conditional image-to-image translation.

TPU-first: training is one jitted step (concat mode of DiffusionInferer);
the n-member sampling ensemble is one jitted vmap over the scan-compiled
reverse loop — n reverse diffusions in a single XLA program.

Usage: python -m generativemodels_tpu.recipes.segmentation_ddpm --steps 50
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from ..inferers import DiffusionInferer
from ..networks.nets import DiffusionModelUNet
from ..networks.schedulers import DDPMScheduler
from ..parallel import TrainState, init_train_state
from ..utils import enable_persistent_compilation_cache
from .train_controlnet import synthetic_masked_batch


def make_segmentation_train_step(
    model_apply, scheduler, tx: optax.GradientTransformation,
    num_train_timesteps: int | None = None,
):
    """Jitted train step: denoise the mask conditioned on the image (concat)."""
    T = num_train_timesteps or scheduler.num_train_timesteps
    inferer = DiffusionInferer(scheduler)

    def loss_fn(params, images, masks, noise, timesteps):
        fn = lambda x, t, context=None: model_apply(params, x, t)
        pred = inferer(masks, fn, noise, timesteps, condition=images, mode="concat")
        return jnp.mean((pred - noise) ** 2)

    @jax.jit
    def step(state: TrainState, images, masks, rng):
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, masks.shape, dtype=masks.dtype)
        timesteps = jax.random.randint(k_t, (masks.shape[0],), 0, T)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, images, masks, noise, timesteps
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(
            optax.apply_updates(state.params, updates), opt_state, state.step + 1
        ), loss

    return step


def segment_with_uncertainty(
    images: jnp.ndarray,
    model_apply_bound,
    scheduler,
    key: jax.Array,
    ensemble: int = 5,
):
    """Sample `ensemble` segmentations of `images`; return (mean, std).

    The reference loops the sampler n times on the host (:263-299); here the
    ensemble axis is a vmap over the scan-compiled reverse loop — one
    program computes all members.
    """
    inferer = DiffusionInferer(scheduler)

    def one(k):
        k_noise, k_samp = jax.random.split(k)
        noise = jax.random.normal(k_noise, images.shape, dtype=images.dtype)
        return inferer.sample(
            noise, model_apply_bound, conditioning=images, mode="concat", key=k_samp
        )

    members = jax.vmap(one)(jax.random.split(key, ensemble))
    return members.mean(axis=0), members.std(axis=0)


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=2.5e-5)
    parser.add_argument("--ensemble", type=int, default=5)
    parser.add_argument("--sample", action="store_true")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="image directory; paired with --label-dir by sorted "
                        "filename. Synthetic blobs + threshold masks if omitted")
    parser.add_argument("--label-dir", type=str, default=None,
                        help="binary mask directory (.npy/.nii/.png)")
    parser.add_argument("--fit", choices=["crop_pad", "resize", "none"],
                        default="crop_pad")
    args = parser.parse_args()
    if bool(args.data_dir) != bool(args.label_dir):
        parser.error("--data-dir and --label-dir must be given together")

    batches = None
    if args.data_dir:
        from ..data import batched_pairs, paired_stream

        batches = batched_pairs(
            paired_stream(args.data_dir, args.label_dir, (args.size,) * 2,
                          args.fit),
            args.batch,
        )

    def next_masked(k, batch):
        if batches is not None and batch == args.batch:
            images, masks = next(batches)
            shape = (batch, 1, args.size, args.size)
            return (jnp.asarray(images, jnp.float32).reshape(shape),
                    (jnp.asarray(masks, jnp.float32).reshape(shape) > 0)
                    .astype(jnp.float32))
        return synthetic_masked_batch(k, batch, args.size)

    # in_channels=2: noisy mask + conditioning image (reference :177)
    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=2, out_channels=1, num_res_blocks=1,
        num_channels=(64, 64, 64), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32,
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(args.lr)

    x0 = jnp.zeros((args.batch, 2, args.size, args.size))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32)
    )
    apply = lambda p, x, t: model.apply({"params": p}, x, t)
    step = make_segmentation_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)

    rng = jax.random.PRNGKey(42)
    for i in range(args.steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images, masks = next_masked(k_data, args.batch)
        state, loss = step(state, images, masks, k_step)
        if (i + 1) % 10 == 0:
            print(f"step {i + 1} loss={float(loss):.4f}")

    if args.sample:
        rng, k_data, k_s = jax.random.split(rng, 3)
        images, _ = synthetic_masked_batch(k_data, 2, args.size)
        fn = lambda x, t, context=None: model.apply({"params": state.params}, x, t)
        mean, std = jax.jit(
            lambda imgs, k: segment_with_uncertainty(
                imgs, fn, scheduler, k, ensemble=args.ensemble
            )
        )(images, k_s)
        print(f"segmentation: mean shape={mean.shape} uncertainty mean={float(std.mean()):.4f}")
    print("done")


if __name__ == "__main__":
    main()
