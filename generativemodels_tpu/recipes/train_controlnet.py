"""2D ControlNet fine-tuning recipe (frozen diffusion model + trained CN).

Reference parity: tutorials/generative/2d_controlnet/2d_controlnet.py —
(1) train a DDPM UNet (:191-290), (2) create a ControlNet, seed it from the
UNet via non-strict load_state_dict (:299-310 -> copy_weights_to_controlnet
here), freeze the UNet (:313-314), and train only the ControlNet on
(image, mask) pairs through ControlNetDiffusionInferer (:333-363), where the
mask is a whole-image threshold of the image (:115-118).

TPU-first: the frozen UNet params are closed over by the jitted step, so
"freezing" is structural (no requires_grad bookkeeping) — gradients are
taken w.r.t. the ControlNet params only and both networks execute in one
XLA program. Conditional sampling compiles the whole reverse loop +
per-step ControlNet forward into one lax.scan.

Usage: python -m generativemodels_tpu.recipes.train_controlnet --steps 50
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from ..inferers import ControlNetDiffusionInferer
from ..networks.nets import ControlNet, DiffusionModelUNet, copy_weights_to_controlnet
from ..networks.schedulers import DDPMScheduler
from ..parallel import TrainState, init_train_state, make_diffusion_train_step
from ..utils import enable_persistent_compilation_cache
from .train_2d_ddpm import synthetic_batch


def synthetic_masked_batch(key, batch: int, size: int, threshold: float = 0.3):
    """(images, masks): blob images + their binary threshold masks
    (the tutorial's whole-brain mask, 2d_controlnet.py:115-118)."""
    images = synthetic_batch(key, batch, size)
    masks = (images > threshold).astype(images.dtype)
    return images, masks


def make_controlnet_train_step(
    frozen_unet_apply,
    cn_apply,
    scheduler,
    tx: optax.GradientTransformation,
    num_train_timesteps: int | None = None,
):
    """Jitted ControlNet-only train step.

    Args:
        frozen_unet_apply: `(noisy, timesteps, down_res, mid_res) -> pred`
            with the trained UNet params already closed over (frozen).
        cn_apply: `(cn_params, noisy, timesteps, cn_cond) -> (down_res, mid_res)`.
        scheduler / tx: noise scheduler and optimizer for the CN params.

    Returns `step(state, images, masks, rng) -> (state, loss)`.
    """
    T = num_train_timesteps or scheduler.num_train_timesteps

    def loss_fn(cn_params, images, masks, noise, timesteps):
        noisy = scheduler.add_noise(images, noise, timesteps)
        down_res, mid_res = cn_apply(cn_params, noisy, timesteps, masks)
        pred = frozen_unet_apply(noisy, timesteps, down_res, mid_res)
        return jnp.mean((pred - noise) ** 2)

    @jax.jit
    def step(state: TrainState, images, masks, rng):
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, images.shape, dtype=images.dtype)
        timesteps = jax.random.randint(k_t, (images.shape[0],), 0, T)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, images, masks, noise, timesteps
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--pretrain-steps", type=int, default=30)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=2.5e-5)
    parser.add_argument("--channels", type=int, nargs="+", default=[64, 128, 128])
    parser.add_argument("--norm-groups", type=int, default=32)
    parser.add_argument("--sample", action="store_true", help="sample after training")
    parser.add_argument("--data-dir", type=str, default=None,
                        help=".nii/.nii.gz/.npy/PNG/JPEG directory; synthetic blobs "
                        "if omitted. Masks are derived by thresholding, like the "
                        "tutorial's whole-brain mask (2d_controlnet.py:115-118)")
    parser.add_argument("--mask-threshold", type=float, default=0.3)
    parser.add_argument("--fit", choices=["crop_pad", "resize", "none"],
                        default="crop_pad")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--cache", action="store_true")
    args = parser.parse_args()

    data_iter = None
    if args.data_dir:
        from ..data import device_batches

        data_iter = device_batches(
            args.data_dir, (args.size,) * 2, args.batch, args.fit,
            cache=args.cache, augment=args.augment,
        )

    def next_batch(k):
        if data_iter is not None:
            return next(data_iter)
        return synthetic_batch(k, args.batch, args.size)

    def next_masked_batch(k):
        images = next_batch(k)
        return images, (images > args.mask_threshold).astype(images.dtype)

    unet_kwargs = dict(
        spatial_dims=2, in_channels=1, num_res_blocks=1,
        num_channels=tuple(args.channels),
        attention_levels=(False,) + (True,) * (len(args.channels) - 1),
        num_head_channels=args.channels[-1],
        norm_num_groups=args.norm_groups,
    )
    model = DiffusionModelUNet(out_channels=1, **unet_kwargs)
    scheduler = DDPMScheduler(num_train_timesteps=1000)

    # ---- phase 1: train the diffusion model (2d_controlnet.py:215-290) -----
    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32)
    )
    tx1 = optax.adam(args.lr)
    apply = lambda p, x, t: model.apply({"params": p}, x, t)
    pre_step = make_diffusion_train_step(apply, scheduler, tx1, donate=False)
    state1 = init_train_state(variables["params"], tx1)
    rng = jax.random.PRNGKey(42)
    for i in range(args.pretrain_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = next_batch(k_data)
        state1, loss = pre_step(state1, images, k_step)
        if (i + 1) % 10 == 0:
            print(f"[unet] step {i + 1} loss={float(loss):.4f}")
    unet_params = state1.params

    # ---- phase 2: ControlNet seeded from the UNet, UNet frozen -------------
    controlnet = ControlNet(
        conditioning_embedding_num_channels=(16,), **unet_kwargs
    )
    cn_vars = jax.jit(controlnet.init)(
        jax.random.PRNGKey(1), x0, jnp.zeros((args.batch,), jnp.int32), x0
    )
    cn_params = copy_weights_to_controlnet(cn_vars["params"], unet_params)

    def frozen_unet_apply(noisy, timesteps, down_res, mid_res):
        return model.apply(
            {"params": unet_params}, noisy, timesteps,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
        )

    def cn_apply(p, noisy, timesteps, masks):
        return controlnet.apply({"params": p}, noisy, timesteps, controlnet_cond=masks)

    tx2 = optax.adam(args.lr)
    step = make_controlnet_train_step(frozen_unet_apply, cn_apply, scheduler, tx2)
    state2 = init_train_state(cn_params, tx2)
    for i in range(args.steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images, masks = next_masked_batch(k_data)
        state2, loss = step(state2, images, masks, k_step)
        if (i + 1) % 10 == 0:
            print(f"[controlnet] step {i + 1} loss={float(loss):.4f}")

    # ---- conditional sampling (2d_controlnet.py:407-429) -------------------
    if args.sample:
        inferer = ControlNetDiffusionInferer(scheduler)
        rng, k_noise, k_samp, k_mask = jax.random.split(rng, 4)
        _, masks = synthetic_masked_batch(k_mask, 4, args.size)
        unet_fn = lambda x, t, context=None, **kw: model.apply(
            {"params": unet_params}, x, t, **kw
        )
        cn_fn = lambda x, t, controlnet_cond, context=None: controlnet.apply(
            {"params": state2.params}, x, t, controlnet_cond=controlnet_cond
        )
        noise = jax.random.normal(k_noise, (4, 1, args.size, args.size))
        samples = jax.jit(
            lambda n, k: inferer.sample(n, unet_fn, cn_fn, cn_cond=masks, key=k)
        )(noise, k_samp)
        print(f"samples: shape={samples.shape} std={float(samples.std()):.3f}")

    print("done")


if __name__ == "__main__":
    main()
