"""VQ-GAN training recipe (VQVAE + PatchGAN adversarial + feature matching).

Reference parity: tutorials/generative/2d_vqgan/2d_vqgan_tutorial.py — a
VQVAE trained with L1 reconstruction + quantization loss + adversarial loss
against a PatchDiscriminator, with a reconstruction-only warm-up. We add the
Pix2PixHD feature-matching term the reference's PatchDiscriminator exposes
its intermediates for (patchgan_discriminator.py:269-283).

`--spatial-dims 3` trains on volumes (depth-decomposed convs); with
`--adv-weight 0` that is the reconstruction-only 3D VQ-VAE tutorial
(tutorials/generative/3d_vqvae/3d_vqvae_tutorial.py:129-143, which trains
with plain L1 + quantization, no discriminator).

TPU-first: one fused jitted step updates G (including the EMA codebook
collection) and D in a single XLA program; the EMA codebook update is a
mutable-collection thread, not an optimizer state.

Usage: python -m generativemodels_tpu.recipes.train_vqgan --steps 50
"""
from __future__ import annotations

import argparse
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..losses import PatchAdversarialLoss, feature_matching_loss
from ..networks.nets import PatchDiscriminator, VQVAE
from ..utils import enable_persistent_compilation_cache
from .train_2d_ddpm import synthetic_batch


class VQGANState(NamedTuple):
    g_params: dict
    codebook: dict
    g_opt_state: optax.OptState
    d_params: dict
    d_opt_state: optax.OptState
    step: jnp.ndarray


def make_vqgan_step(
    vqvae: VQVAE,
    disc: PatchDiscriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    adv_weight: float = 0.01,
    fm_weight: float = 1.0,
    quant_weight: float = 1.0,
):
    """Fused jitted VQ-GAN step: G (+ EMA codebook) and D in one program."""
    adv = PatchAdversarialLoss(criterion="least_squares")

    @jax.jit
    def step(state: VQGANState, images: jnp.ndarray):
        real_outs = disc.apply({"params": state.d_params}, images)
        real_logits, real_feats = real_outs[-1], real_outs[:-1]

        def g_loss(g_params):
            (recon, q_loss), mutated = vqvae.apply(
                {"params": g_params, "codebook": state.codebook},
                images,
                train=True,
                mutable=["codebook"],
            )
            fake_outs = disc.apply({"params": state.d_params}, recon)
            fake_logits, fake_feats = fake_outs[-1], fake_outs[:-1]
            recon_l1 = jnp.mean(jnp.abs(recon - images))
            g_adv = adv(fake_logits, target_is_real=True, for_discriminator=False)
            fm = feature_matching_loss(real_feats, fake_feats)
            total = (
                recon_l1
                + quant_weight * q_loss
                + adv_weight * (g_adv + fm_weight * fm)
            )
            aux = {
                "reconstruction_loss": recon_l1,
                "quantization_loss": q_loss,
                "generator_loss": g_adv,
                "feature_matching_loss": fm,
                "fakes": recon,
                "codebook": mutated["codebook"],
            }
            return total, aux

        (g_total, aux), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
            state.g_params
        )
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        fakes = jax.lax.stop_gradient(aux["fakes"])

        def d_loss(d_params):
            fake_logits = disc.apply({"params": d_params}, fakes)[-1]
            real_logits_d = disc.apply({"params": d_params}, images)[-1]
            return 0.5 * (
                adv(real_logits_d, True, True) + adv(fake_logits, False, True)
            )

        d_total, d_grads = jax.value_and_grad(d_loss)(state.d_params)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = VQGANState(
            g_params=g_params,
            codebook=aux["codebook"],
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_opt_state=d_opt_state,
            step=state.step + 1,
        )
        out = {
            "g_total": g_total,
            "d_total": d_total,
            "reconstruction_loss": aux["reconstruction_loss"],
            "quantization_loss": aux["quantization_loss"],
            "generator_loss": aux["generator_loss"],
            "feature_matching_loss": aux["feature_matching_loss"],
        }
        return new_state, out

    return step


def main(argv=None) -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--warmup-steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--spatial-dims", type=int, choices=[2, 3], default=2)
    parser.add_argument("--channels", type=int, nargs="+", default=None,
                        help="per-level channels (default: 128 256 for 2D, "
                        "reference 3d_vqvae uses 256 256)")
    parser.add_argument("--adv-weight", type=float, default=0.01,
                        help="0 disables the GAN term (3d_vqvae tutorial)")
    parser.add_argument("--fm-weight", type=float, default=1.0)
    parser.add_argument("--data-dir", type=str, default=None,
                        help="directory of .nii/.nii.gz/.npy images (native loader); synthetic blobs otherwise")
    parser.add_argument("--fit", choices=["crop_pad", "resize", "none"],
                        default="crop_pad",
                        help="fit real-size samples to --size: center crop/zero-pad, interpolating resize, or none (shapes must already match)")
    parser.add_argument("--augment", action="store_true",
                        help="tutorial-default RandAffine augmentation (rotate ±5°, "
                        "translate ±1px, scale ±5%%, prob 0.5)")
    parser.add_argument("--cache", action="store_true",
                        help="decode+fit once and cache samples in host RAM "
                        "(reference CacheDataset)")
    args = parser.parse_args(argv)

    nd = args.spatial_dims
    channels = tuple(args.channels) if args.channels else (128, 256)
    vqvae = VQVAE(
        spatial_dims=nd, in_channels=1, out_channels=1,
        num_channels=channels, num_res_layers=2, num_res_channels=channels,
        downsample_parameters=((2, 4, 1, 1),) * len(channels),
        upsample_parameters=((2, 4, 1, 1, 0),) * len(channels),
        num_embeddings=256, embedding_dim=32,
    )
    disc = PatchDiscriminator(
        spatial_dims=nd, num_channels=64, in_channels=1, num_layers_d=3,
        norm="INSTANCE",
    )

    x0 = jnp.zeros((args.batch, 1) + (args.size,) * nd)
    g_vars = jax.jit(vqvae.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x0, train=False
    )
    d_vars = jax.jit(disc.init)(jax.random.PRNGKey(1), x0)
    g_tx, d_tx = optax.adam(1e-4), optax.adam(5e-4)

    state = VQGANState(
        g_params=g_vars["params"],
        codebook=g_vars["codebook"],
        g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_opt_state=d_tx.init(d_vars["params"]),
        step=jnp.asarray(0),
    )

    warm = make_vqgan_step(vqvae, disc, g_tx, d_tx, adv_weight=0.0,
                           fm_weight=args.fm_weight)
    full = make_vqgan_step(vqvae, disc, g_tx, d_tx, adv_weight=args.adv_weight,
                           fm_weight=args.fm_weight)

    data_iter = None
    if args.data_dir:
        from ..data import device_batches

        data_iter = device_batches(
            args.data_dir, (args.size,) * nd, args.batch, args.fit,
            cache=args.cache, augment=args.augment,
        )

    def synth(key):
        if nd == 3:
            from .train_3d_ddpm import synthetic_volume

            return synthetic_volume(key, args.batch, args.size)
        return synthetic_batch(key, args.batch, args.size)

    rng = jax.random.PRNGKey(42)
    for i in range(args.steps):
        rng, k = jax.random.split(rng)
        images = next(data_iter) if data_iter is not None else synth(k)
        step_fn = warm if i < args.warmup_steps else full
        state, out = step_fn(state, images)
        if (i + 1) % 10 == 0:
            print(
                f"step {i + 1} recon={float(out['reconstruction_loss']):.4f} "
                f"quant={float(out['quantization_loss']):.4f} "
                f"g_adv={float(out['generator_loss']):.4f} "
                f"fm={float(out['feature_matching_loss']):.4f} "
                f"d={float(out['d_total']):.4f}"
            )


if __name__ == "__main__":
    main()
