"""VQ-VAE + autoregressive transformer training recipe (anomaly detection).

Reference parity: the VQ-VAE + DecoderOnlyTransformer anomaly-detection
recipe family (BASELINE config #5): stage 1 trains the VQ-VAE (L1 +
quantization loss with EMA codebook updates), stage 2 trains the
transformer on ordered codebook indices with BOS teacher forcing; the
spatial log-likelihood map flags anomalies.

Usage: python -m generativemodels_tpu.recipes.train_vqvae_transformer --stage1-steps 50
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from ..inferers import VQVAETransformerInferer
from ..networks.nets import VQVAE, DecoderOnlyTransformer
from ..utils import Ordering
from ..utils import enable_persistent_compilation_cache
from .train_2d_ddpm import synthetic_batch


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage1-steps", type=int, default=50)
    parser.add_argument("--stage2-steps", type=int, default=50)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--num-embeddings", type=int, default=64)
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
        if data_iter is not None:
            return next(data_iter)
        return synthetic_batch(k, args.batch, args.size)

    vqvae = VQVAE(
        spatial_dims=2, in_channels=1, out_channels=1, num_channels=(64, 128),
        num_res_layers=2, num_res_channels=(64, 128),
        downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
        upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
        num_embeddings=args.num_embeddings, embedding_dim=32,
    )
    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    variables = vqvae.init(jax.random.PRNGKey(0), x0)
    params, codebook = variables["params"], variables["codebook"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def stage1_step(params, codebook, opt_state, images):
        def loss_fn(p):
            (recon, qloss), mutated = vqvae.apply(
                {"params": p, "codebook": codebook}, images, train=True,
                mutable=["codebook", "metrics"],
            )
            l1 = jnp.mean(jnp.abs(recon - images))
            perplexity = mutated["metrics"]["quantizer"]["perplexity"][0]
            return l1 + qloss, (mutated["codebook"], perplexity)

        (loss, (new_codebook, perplexity)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_codebook, opt_state, loss, perplexity

    rng = jax.random.PRNGKey(42)
    for i in range(args.stage1_steps):
        rng, k = jax.random.split(rng)
        images = next_batch(k)
        params, codebook, opt_state, loss, perplexity = stage1_step(
            params, codebook, opt_state, images
        )
        if (i + 1) % 10 == 0:
            print(f"[stage1] step {i + 1} loss={float(loss):.4f} "
                  f"perplexity={float(perplexity):.1f}")

    vq_bound = vqvae.bind({"params": params, "codebook": codebook})
    latent_spatial = (args.size // 4, args.size // 4)
    seq_len = latent_spatial[0] * latent_spatial[1]
    ordering = Ordering("raster_scan", 2, (1,) + latent_spatial)
    inferer = VQVAETransformerInferer()

    transformer = DecoderOnlyTransformer(
        num_tokens=args.num_embeddings + 1, max_seq_len=seq_len,
        attn_layers_dim=128, attn_layers_depth=4, attn_layers_heads=4,
    )
    t_vars = transformer.init(
        jax.random.PRNGKey(1), jnp.zeros((args.batch, seq_len), jnp.int32)
    )
    t_params = t_vars["params"]
    tx2 = optax.adam(3e-4)
    opt2 = tx2.init(t_params)

    @jax.jit
    def stage2_step(t_params, opt2, images, key):
        def loss_fn(p):
            tr = transformer.bind({"params": p})
            logits, target, _ = inferer(
                images, vq_bound, tr, ordering, return_latent=True, key=key
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(t_params)
        updates, opt2 = tx2.update(grads, opt2, t_params)
        return optax.apply_updates(t_params, updates), opt2, loss

    for i in range(args.stage2_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        images = next_batch(k_data)
        t_params, opt2, loss = stage2_step(t_params, opt2, images, k_step)
        if (i + 1) % 10 == 0:
            print(f"[stage2] step {i + 1} nll={float(loss):.4f}")

    # anomaly likelihood map on one batch
    tr_bound = transformer.bind({"params": t_params})
    rng, k = jax.random.split(rng)
    images = synthetic_batch(k, 2, args.size)
    ll_map = inferer.get_likelihood(images, vq_bound, tr_bound, ordering)
    print(f"likelihood map {ll_map.shape}, mean log-prob {float(ll_map.mean()):.3f}")


if __name__ == "__main__":
    main()
