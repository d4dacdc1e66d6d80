"""2D SPADE latent-diffusion training recipe (semantic-conditioned LDM).

Reference parity: tutorials/generative/2d_spade_ldm/2d_spade_ldm.py —
stage 1 trains a SPADEAutoencoderKL adversarially (L1 + KL + PatchGAN,
:240-300), stage 2 trains a SPADEDiffusionModelUNet in latent space with
the one-hot segmentation driving the SPADE norms of both decoders
(:380-447); labels are one-hot encoded (:163-170).

TPU-first: stage 1 is one fused jitted G+D step; stage 2's loss and the
conditional sampler (reverse scan + SPADE decode) are single XLA programs.

Usage: python -m generativemodels_tpu.recipes.train_spade_ldm --stage1-steps 30 --stage2-steps 30
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from ..engines import AdversarialTrainState, make_adversarial_train_step
from ..inferers import LatentDiffusionInferer
from ..losses import PatchAdversarialLoss
from ..networks.nets import PatchDiscriminator, SPADEAutoencoderKL, SPADEDiffusionModelUNet
from ..networks.schedulers import DDPMScheduler
from ..parallel import init_train_state
from ..utils import enable_persistent_compilation_cache
from .super_resolution import compute_scale_factor
from .train_2d_ddpm import synthetic_batch


def one_hot_labels(labels: jnp.ndarray, label_nc: int) -> jnp.ndarray:
    """(B, 1, *spatial) integer label map -> (B, label_nc, *spatial) one-hot
    (the tutorial's one_hot helper, 2d_spade_ldm.py:163-170)."""
    onehot = jax.nn.one_hot(labels[:, 0].astype(jnp.int32), label_nc, axis=-1)
    return jnp.moveaxis(onehot, -1, 1).astype(jnp.float32)


def synthetic_seg_batch(key, batch: int, size: int, label_nc: int = 3):
    """(images, one-hot labels): blob images with ring-quantised label maps."""
    images = synthetic_batch(key, batch, size)
    # quantise intensity into label_nc classes: background / outer / core
    labels = jnp.clip((images * label_nc).astype(jnp.int32), 0, label_nc - 1)
    return images, one_hot_labels(labels, label_nc)


def make_seg_batch_fn(args, label_nc):
    """Return `next_seg_batch(key, batch)` -> (images, one-hot labels):
    paired --data-dir/--label-dir files (sorted-filename alignment, labels
    nearest-fitted, values clipped to label_nc) when given, else the
    synthetic ring-quantised blobs."""
    if getattr(args, "data_dir", None):
        from ..data import batched_pairs, paired_stream

        pairs = paired_stream(args.data_dir, args.label_dir,
                              (args.size,) * 2, args.fit)
        batches = batched_pairs(pairs, args.batch)

        def next_seg_batch(key, batch):
            images, labels = next(batches)
            images = jnp.asarray(images, jnp.float32).reshape(
                batch, 1, args.size, args.size)
            labels = jnp.clip(
                jnp.asarray(labels).reshape(batch, 1, args.size, args.size),
                0, label_nc - 1)
            return images, one_hot_labels(labels, label_nc)
    else:
        def next_seg_batch(key, batch):
            return synthetic_seg_batch(key, batch, args.size, label_nc)
    return next_seg_batch


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage1-steps", type=int, default=30)
    parser.add_argument("--stage2-steps", type=int, default=30)
    parser.add_argument("--warmup-steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--label-nc", type=int, default=3)
    parser.add_argument("--kl-weight", type=float, default=1e-6)
    parser.add_argument("--adv-weight", type=float, default=0.01)
    parser.add_argument("--sample", action="store_true")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="image directory; paired with --label-dir by sorted "
                        "filename. Synthetic blobs + ring labels if omitted")
    parser.add_argument("--label-dir", type=str, default=None,
                        help="integer label-map directory (.npy/.nii/.png)")
    parser.add_argument("--fit", choices=["crop_pad", "resize", "none"],
                        default="crop_pad")
    args = parser.parse_args()
    if bool(args.data_dir) != bool(args.label_dir):
        parser.error("--data-dir and --label-dir must be given together")

    label_nc = args.label_nc
    next_seg_batch = make_seg_batch_fn(args, label_nc)

    # ---- stage 1: adversarial SPADE AutoencoderKL --------------------------
    aekl = SPADEAutoencoderKL(
        spatial_dims=2, label_nc=label_nc, in_channels=1, out_channels=1,
        num_res_blocks=1, num_channels=(32, 64, 64),
        attention_levels=(False, False, False), latent_channels=3,
        norm_num_groups=32, with_encoder_nonlocal_attn=False,
        with_decoder_nonlocal_attn=False,
    )
    disc = PatchDiscriminator(
        spatial_dims=2, num_channels=32, in_channels=1, num_layers_d=3,
        norm="INSTANCE",
    )
    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    seg0 = jnp.zeros((args.batch, label_nc, args.size, args.size))
    g_vars = jax.jit(aekl.init)(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x0, seg0
    )
    d_vars = jax.jit(disc.init)(jax.random.PRNGKey(2), x0)
    adv = PatchAdversarialLoss(criterion="least_squares")
    kl_weight = args.kl_weight

    def g_forward(params, model_state, inputs, rng):
        images, seg = inputs
        recon, z_mu, z_sigma = aekl.apply(
            {"params": params}, images, seg, rngs={"sampling": rng}
        )
        return (recon, z_mu, z_sigma), model_state

    def d_forward(params, model_state, images_or_gout):
        imgs = images_or_gout
        if isinstance(imgs, tuple):
            imgs = imgs[0]  # reconstruction from G output, or (images, seg) reals
        return disc.apply({"params": params}, imgs)[-1], model_state

    def recon_loss_fn(g_out, targets):
        recon, z_mu, z_sigma = g_out
        l1 = jnp.mean(jnp.abs(recon - targets))
        kl = 0.5 * jnp.mean(z_mu**2 + z_sigma**2 - jnp.log(z_sigma**2 + 1e-12) - 1)
        return l1 + kl_weight * kl

    def g_adv_loss(fake_logits):
        return adv(fake_logits, target_is_real=True, for_discriminator=False)

    def d_loss_fn(real_logits, fake_logits):
        return 0.5 * (adv(real_logits, True, True) + adv(fake_logits, False, True))

    g_tx, d_tx = optax.adam(2e-4), optax.adam(4e-4)
    state = AdversarialTrainState(
        g_params=g_vars["params"], g_model_state={}, g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"], d_model_state={}, d_opt_state=d_tx.init(d_vars["params"]),
        step=jnp.asarray(0),
    )
    warm_step = make_adversarial_train_step(
        g_forward, d_forward, g_tx, d_tx, recon_loss_fn, g_adv_loss, d_loss_fn,
        adv_weight=0.0, donate=False,
    )
    adv_step = make_adversarial_train_step(
        g_forward, d_forward, g_tx, d_tx, recon_loss_fn, g_adv_loss, d_loss_fn,
        adv_weight=args.adv_weight, donate=False,
    )
    rng = jax.random.PRNGKey(42)
    for i in range(args.stage1_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images, seg = next_seg_batch(k_data, args.batch)
        step_fn = warm_step if i < args.warmup_steps else adv_step
        state, out = step_fn(state, (images, seg), images, k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage1] step {i + 1} recon={float(out['reconstruction_loss']):.4f}")

    aekl_bound = aekl.bind(
        {"params": state.g_params}, rngs={"sampling": jax.random.PRNGKey(9)}
    )

    # ---- scale factor (2d_spade_ldm.py LDM convention) ----------------------
    rng, k = jax.random.split(rng)
    images, seg = next_seg_batch(k, args.batch)
    z = aekl_bound.encode_stage_2_inputs(images, key=jax.random.PRNGKey(10))
    scale_factor = float(compute_scale_factor(z))
    print(f"scale_factor = {scale_factor:.4f}")

    # ---- stage 2: SPADE diffusion UNet in latent space ----------------------
    latent_size = args.size // (2 ** 2)
    unet = SPADEDiffusionModelUNet(
        spatial_dims=2, label_nc=label_nc, in_channels=3, out_channels=3,
        num_res_blocks=1, num_channels=(64, 128), attention_levels=(False, True),
        num_head_channels=128,
    )
    z0 = jnp.zeros((args.batch, 3, latent_size, latent_size))
    seg_latent0 = jnp.zeros((args.batch, label_nc, latent_size, latent_size))
    unet_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(3), z0, jnp.zeros((args.batch,), jnp.int32), seg_latent0
    )
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    inferer = LatentDiffusionInferer(scheduler, scale_factor=scale_factor)
    tx2 = optax.adam(1e-4)
    train2 = init_train_state(unet_vars["params"], tx2)

    @jax.jit
    def stage2_step(state, images, seg, rng):
        k_noise, k_t, k_enc = jax.random.split(rng, 3)
        noise = jax.random.normal(k_noise, z0.shape)
        timesteps = jax.random.randint(k_t, (images.shape[0],), 0, 1000)

        def loss_fn(p):
            # SPADE norms nearest-resize the full-res seg map internally
            fn = lambda x, t, context=None, seg=None: unet.apply({"params": p}, x, t, seg)
            pred = inferer(
                images, aekl_bound, fn, noise, timesteps, seg=seg, key=k_enc
            )
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx2.update(grads, state.opt_state, state.params)
        return state._replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state, step=state.step + 1,
        ), loss

    for i in range(args.stage2_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images, seg = next_seg_batch(k_data, args.batch)
        train2, loss = stage2_step(train2, images, seg, k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage2] step {i + 1} loss={float(loss):.4f}")

    if args.sample:
        rng, k_data, k_noise, k_s = jax.random.split(rng, 4)
        _, seg = synthetic_seg_batch(k_data, 2, args.size, label_nc)
        fn = lambda x, t, context=None, seg=None: unet.apply(
            {"params": train2.params}, x, t, seg
        )
        noise = jax.random.normal(k_noise, (2, 3, latent_size, latent_size))
        samples = inferer.sample(noise, aekl_bound, fn, seg=seg, key=k_s)
        print(f"samples: shape={samples.shape} std={float(samples.std()):.3f}")

    print("done")


if __name__ == "__main__":
    main()
