"""Two-stage 3D latent diffusion training recipe.

Reference parity: tutorials/generative/3d_ldm/3d_ldm_tutorial.py — stage 1
trains a 3D AutoencoderKL adversarially (PatchGAN + L1 + KL, :141-179 and
:186-240), the LDM scale factor is 1/std(z) of a training batch (:327),
then stage 2 trains a 3D diffusion UNet in latent space (:298-334). With
`--stage2-steps 0` this is the 3d_autoencoderkl tutorial
(tutorials/generative/3d_autoencoderkl/3d_autoencoderkl_tutorial.py) minus
the pretrained perceptual term, which needs weight files this environment
cannot download (pass them via losses.PerceptualLoss when available).

TPU-first: the G+D stage-1 update is one fused jitted program; stage 2 is
one jitted step over the latent; the 3D convs everywhere are the
depth-decomposed lowering. Default model sizes match the reference
tutorial (AEKL 32/64/64 with latent_channels=3, PatchGAN 32ch 3 layers,
latent UNet 32/64/64 heads 64).

Runs on synthetic 3D blobs; `--data-dir` streams .nii/.nii.gz/.npy.

Usage:
    python -m generativemodels_tpu.recipes.train_3d_ldm \
        --stage1-steps 50 --stage2-steps 50
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
from .train_3d_ddpm import synthetic_volume


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage1-steps", type=int, default=50)
    parser.add_argument("--stage2-steps", type=int, default=50,
                        help="0 = stage 1 only (the 3d_autoencoderkl tutorial)")
    parser.add_argument("--warmup-steps", type=int, default=10,
                        help="reconstruction-only steps before the adversarial term")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--size", type=int, default=32,
                        help="cubic volume edge (latent is size/4)")
    parser.add_argument("--kl-weight", type=float, default=1e-6)
    parser.add_argument("--adv-weight", type=float, default=0.01)
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="f32")
    parser.add_argument("--sample", action="store_true",
                        help="sample one volume through the latent route at the end")
    parser.add_argument("--sample-steps", type=int, default=50)
    parser.add_argument("--data-dir", type=str, default=None,
                        help=".nii/.nii.gz/.npy volume directory; synthetic blobs if omitted")
    parser.add_argument("--fit", choices=["crop_pad", "resize", "none"],
                        default="crop_pad",
                        help="fit real-size samples to --size: center crop/zero-pad, interpolating resize, or none (shapes must already match)")
    parser.add_argument("--augment", action="store_true",
                        help="tutorial-default RandAffine augmentation (rotate ±5°, "
                        "translate ±1px, scale ±5%%, prob 0.5)")
    parser.add_argument("--cache", action="store_true",
                        help="decode+fit once and cache samples in host RAM "
                        "(reference CacheDataset)")
    return parser


def main(argv=None):
    enable_persistent_compilation_cache()
    args = build_argparser().parse_args(argv)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    # ---- stage 1: adversarial 3D AutoencoderKL ----------------------------
    # model sizes: reference 3d_ldm_tutorial.py:141-153
    aekl = AutoencoderKL(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 64), attention_levels=(False, False, True),
        latent_channels=3, norm_num_groups=16,
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
        dtype=dtype,
    )
    disc = PatchDiscriminator(
        spatial_dims=3, num_channels=32, in_channels=1, num_layers_d=3,
        norm="INSTANCE",
    )
    x0 = jnp.zeros((args.batch, 1, args.size, args.size, args.size))
    g_vars = jax.jit(aekl.init)(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x0
    )
    d_vars = jax.jit(disc.init)(jax.random.PRNGKey(2), x0)
    adv = PatchAdversarialLoss(criterion="least_squares")
    kl_weight = args.kl_weight

    def g_forward(params, model_state, inputs, rng):
        recon, z_mu, z_sigma = aekl.apply(
            {"params": params}, inputs, rngs={"sampling": rng}
        )
        return (recon, z_mu, z_sigma), model_state

    def recon_loss_fn(g_out, targets):
        recon, z_mu, z_sigma = g_out
        l1 = jnp.mean(jnp.abs(recon - targets))
        kl = 0.5 * jnp.mean(z_mu**2 + z_sigma**2 - jnp.log(z_sigma**2 + 1e-12) - 1)
        return l1 + kl_weight * kl

    def g_adv_loss(fake_logits):
        return adv(fake_logits, target_is_real=True, for_discriminator=False)

    def d_loss_fn(real_logits, fake_logits):
        return 0.5 * (adv(real_logits, True, True) + adv(fake_logits, False, True))

    def wrap_d_forward(params, model_state, images_or_gout):
        imgs = images_or_gout[0] if isinstance(images_or_gout, tuple) else images_or_gout
        return disc.apply({"params": params}, imgs)[-1], model_state

    g_tx, d_tx = optax.adam(1e-4), optax.adam(1e-4)  # reference :178-179
    state = AdversarialTrainState(
        g_params=g_vars["params"], g_model_state={},
        g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"], d_model_state={},
        d_opt_state=d_tx.init(d_vars["params"]),
        step=jnp.asarray(0),
    )
    warm_step = make_adversarial_train_step(
        g_forward, wrap_d_forward, g_tx, d_tx, recon_loss_fn, g_adv_loss, d_loss_fn,
        adv_weight=0.0, donate=False,
    )
    adv_step = make_adversarial_train_step(
        g_forward, wrap_d_forward, g_tx, d_tx, recon_loss_fn, g_adv_loss, d_loss_fn,
        adv_weight=args.adv_weight, donate=False,
    )

    data_iter = None
    if args.data_dir:
        from ..data import device_batches

        data_iter = device_batches(
            args.data_dir, (args.size,) * 3, args.batch, args.fit,
            cache=args.cache, augment=args.augment,
        )

    def next_batch(key):
        if data_iter is not None:
            return next(data_iter)
        return synthetic_volume(key, args.batch, args.size)

    rng = jax.random.PRNGKey(42)
    for i in range(args.stage1_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = next_batch(k_data)
        step_fn = warm_step if i < args.warmup_steps else adv_step
        state, out = step_fn(state, images, images, k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage1] step {i + 1} recon={float(out['reconstruction_loss']):.4f} "
                  f"d={float(out['discriminator_loss']):.4f}")

    aekl_bound = aekl.bind(
        {"params": state.g_params}, rngs={"sampling": jax.random.PRNGKey(9)}
    )
    if args.stage2_steps <= 0:
        print("stage 1 only (autoencoder training) — done")
        return state

    # ---- scale factor (reference :327) ------------------------------------
    rng, k = jax.random.split(rng)
    z = aekl_bound.encode_stage_2_inputs(next_batch(k), key=jax.random.PRNGKey(10))
    scale_factor = float(compute_scale_factor(z))
    print(f"scale_factor = {scale_factor:.4f}")

    # ---- stage 2: 3D latent diffusion (reference :298-334) ----------------
    latent_size = args.size // 4
    unet = DiffusionModelUNet(
        spatial_dims=3, in_channels=3, out_channels=3, num_res_blocks=1,
        num_channels=(32, 64, 64), attention_levels=(False, True, True),
        num_head_channels=64, norm_num_groups=16, dtype=dtype,
    )
    z0 = jnp.zeros((args.batch, 3, latent_size, latent_size, latent_size))
    unet_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(3), z0, jnp.zeros((args.batch,), jnp.int32)
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    inferer = LatentDiffusionInferer(scheduler, scale_factor=scale_factor)
    tx2 = optax.adam(1e-4)
    train2 = init_train_state(unet_vars["params"], tx2)

    @jax.jit
    def stage2_step(s, images, rng):
        k_noise, k_t, k_enc = jax.random.split(rng, 3)
        noise = jax.random.normal(k_noise, z0.shape)
        timesteps = jax.random.randint(k_t, (args.batch,), 0, 1000)

        def loss_fn(p):
            fn = lambda x, t, context=None: unet.apply({"params": p}, x, t)
            pred = inferer(images, aekl_bound, fn, noise, timesteps, key=k_enc)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(s.params)
        updates, opt_state = tx2.update(grads, s.opt_state, s.params)
        return s._replace(
            params=optax.apply_updates(s.params, updates),
            opt_state=opt_state, step=s.step + 1,
        ), loss

    for i in range(args.stage2_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        train2, loss = stage2_step(train2, next_batch(k_data), k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage2] step {i + 1} loss={float(loss):.4f}")

    if args.sample:
        ddim = DDPMScheduler(num_train_timesteps=1000)
        ddim.set_timesteps(args.sample_steps)
        sampler = LatentDiffusionInferer(ddim, scale_factor=scale_factor)
        fn = lambda x, t, context=None: unet.apply({"params": train2.params}, x, t)
        img = sampler.sample(
            jax.random.normal(jax.random.PRNGKey(7), (1,) + z0.shape[1:]),
            aekl_bound, fn, key=jax.random.PRNGKey(8),
        )
        img.block_until_ready()
        print(f"latent sample decoded to {tuple(img.shape)}, "
              f"range [{float(img.min()):.3f}, {float(img.max()):.3f}]")

    print("done")
    return train2


if __name__ == "__main__":
    main()
