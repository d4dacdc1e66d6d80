"""Two-stage 2D latent diffusion training recipe.

Reference parity: tutorials/generative/2d_ldm/2d_ldm_tutorial.py — stage 1
trains an AutoencoderKL adversarially (PatchGAN + L1 + KL, discriminator
warm-up :183-240), computes the LDM scale factor as 1/std(z) of the first
batch (:324-334), then stage 2 trains a diffusion UNet in latent space.
TPU-first: both stages are fused jitted steps; the G+D stage-1 update is
one program.

Usage: python -m generativemodels_tpu.recipes.train_2d_ldm --stage1-steps 50 --stage2-steps 50
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from ..engines import AdversarialTrainState, make_adversarial_train_step
from ..inferers import LatentDiffusionInferer
from ..losses import PatchAdversarialLoss
from ..networks.nets import AutoencoderKL, DiffusionModelUNet, PatchDiscriminator
from ..networks.schedulers import DDPMScheduler
from ..parallel import init_train_state
from ..recipes.super_resolution import compute_scale_factor
from ..utils import enable_persistent_compilation_cache
from .train_2d_ddpm import synthetic_batch


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage1-steps", type=int, default=50)
    parser.add_argument("--stage2-steps", type=int, default=50)
    parser.add_argument("--warmup-steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--kl-weight", type=float, default=1e-6)
    parser.add_argument("--adv-weight", type=float, default=0.01)
    parser.add_argument("--data-dir", type=str, default=None,
                        help=".nii/.nii.gz/.npy/PNG/JPEG directory; synthetic blobs if omitted")
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
        # both paths yield [0, 1] images (reference 2d_ldm stage-1 range)
        if data_iter is not None:
            return next(data_iter)
        return synthetic_batch(k, args.batch, args.size)

    # ---- stage 1: adversarial AutoencoderKL --------------------------------
    aekl = AutoencoderKL(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(64, 128, 128), attention_levels=(False, False, False),
        latent_channels=3, norm_num_groups=32,
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
    )
    disc = PatchDiscriminator(
        spatial_dims=2, num_channels=32, in_channels=1, num_layers_d=3, norm="INSTANCE",
    )
    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    g_vars = aekl.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x0
    )
    d_vars = disc.init(jax.random.PRNGKey(2), x0)
    adv = PatchAdversarialLoss(criterion="least_squares")

    kl_weight = args.kl_weight

    def g_forward(params, model_state, inputs, rng):
        recon, z_mu, z_sigma = aekl.apply(
            {"params": params}, inputs, rngs={"sampling": rng}
        )
        # stash the KL term in model_state-free aux via closure loss below
        return (recon, z_mu, z_sigma), model_state

    def d_forward(params, model_state, images):
        return disc.apply({"params": params}, images)[-1], model_state

    def recon_loss_fn(g_out, targets):
        recon, z_mu, z_sigma = g_out
        l1 = jnp.mean(jnp.abs(recon - targets))
        kl = 0.5 * jnp.mean(z_mu**2 + z_sigma**2 - jnp.log(z_sigma**2 + 1e-12) - 1)
        return l1 + kl_weight * kl

    # adversarial losses act on the reconstruction only
    def g_adv_loss(fake_logits):
        return adv(fake_logits, target_is_real=True, for_discriminator=False)

    def d_loss_fn(real_logits, fake_logits):
        return 0.5 * (
            adv(real_logits, True, True) + adv(fake_logits, False, True)
        )

    def wrap_d_forward(params, model_state, images_or_gout):
        # discriminator sees the reconstruction (first element of G output)
        imgs = images_or_gout[0] if isinstance(images_or_gout, tuple) else images_or_gout
        return d_forward(params, model_state, imgs)

    g_tx, d_tx = optax.adam(1e-4), optax.adam(5e-4)
    state = AdversarialTrainState(
        g_params=g_vars["params"], g_model_state={}, g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"], d_model_state={}, d_opt_state=d_tx.init(d_vars["params"]),
        step=jnp.asarray(0),
    )
    # warm-up (reconstruction only) then adversarial: two step functions
    warm_step = make_adversarial_train_step(
        g_forward, wrap_d_forward, g_tx, d_tx, recon_loss_fn, g_adv_loss, d_loss_fn,
        adv_weight=0.0, donate=False,
    )
    adv_step = make_adversarial_train_step(
        g_forward, wrap_d_forward, g_tx, d_tx, recon_loss_fn, g_adv_loss, d_loss_fn,
        adv_weight=args.adv_weight, donate=False,
    )

    rng = jax.random.PRNGKey(42)
    for i in range(args.stage1_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = next_batch(k_data)
        step_fn = warm_step if i < args.warmup_steps else adv_step
        state, out = step_fn(state, images, images, k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage1] step {i + 1} recon={float(out['reconstruction_loss']):.4f} "
                  f"d={float(out['discriminator_loss']):.4f}")

    aekl_vars = {"params": state.g_params}
    aekl_bound = aekl.bind(aekl_vars, rngs={"sampling": jax.random.PRNGKey(9)})

    # ---- scale factor ------------------------------------------------------
    rng, k = jax.random.split(rng)
    first = next_batch(k)
    z = aekl_bound.encode_stage_2_inputs(first, key=jax.random.PRNGKey(10))
    scale_factor = float(compute_scale_factor(z))
    print(f"scale_factor = {scale_factor:.4f}")

    # ---- stage 2: latent diffusion ----------------------------------------
    latent_size = args.size // 4
    unet = DiffusionModelUNet(
        spatial_dims=2, in_channels=3, out_channels=3, num_res_blocks=1,
        num_channels=(64, 128, 128), attention_levels=(False, True, True),
        num_head_channels=128,
    )
    z0 = jnp.zeros((args.batch, 3, latent_size, latent_size))
    unet_vars = unet.init(jax.random.PRNGKey(3), z0, jnp.zeros((args.batch,), jnp.int32))
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    inferer = LatentDiffusionInferer(scheduler, scale_factor=scale_factor)
    tx2 = optax.adam(1e-4)
    train2 = init_train_state(unet_vars["params"], tx2)

    @jax.jit
    def stage2_step(state, images, rng):
        k_noise, k_t, k_enc = jax.random.split(rng, 3)
        noise = jax.random.normal(k_noise, z0.shape)
        timesteps = jax.random.randint(k_t, (args.batch,), 0, 1000)

        def loss_fn(p):
            fn = lambda x, t, context=None: unet.apply({"params": p}, x, t)
            pred = inferer(images, aekl_bound, fn, noise, timesteps, key=k_enc)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx2.update(grads, state.opt_state, state.params)
        return state._replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state, step=state.step + 1,
        ), loss

    for i in range(args.stage2_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = next_batch(k_data)
        train2, loss = stage2_step(train2, images, k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage2] step {i + 1} loss={float(loss):.4f}")

    print("done")


if __name__ == "__main__":
    main()
