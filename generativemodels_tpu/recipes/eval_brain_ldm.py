"""Pre-registered quality eval for the brain-MRI 3D LDM bundle config.

The reference bundle publishes FID 0.0076 / MS-SSIM 0.6555 / 4-G-R-SSIM
0.3883 on UK Biobank (model-zoo/models/
brain_image_synthesis_latent_diffusion_model/configs/metadata.json:21-25).
This recipe pins the exact comparison protocol so that when trained
weights and real data become available the published numbers are one
command away (see docs/BASELINE_CONFIGS.md "Pre-registered quality
evals" for what is compared to what):

  - `msssim`: mean 3D MS-SSIM over disjoint pairs of volumes generated
    with *distinct* random covariates (diversity; compare to 0.6555).
  - `msssim_4g`: mean 3D MS-SSIM over pairs generated with *identical*
    covariates but different noise (our pre-registered reading of the
    bundle's "4-G-R-SSIM"; compare to 0.3883).
  - `fid`: between generated and real volumes' pooled MedicalNet-ResNet10
    features when `--data-dir` (real .nii volumes) and `--fid-weights`
    (medicalnet_resnet10_23datasets.pth) are supplied; otherwise a
    random-init 3D trunk is used and the value is marked not comparable.

Model: the exact bundle architecture from the `brain_3d_ldm` preset
(UNet(256,512,768) over a (3, 20, 28, 20) latent conditioned on 4
covariates, DDIM-50, AEKL decode to 160x224x160); `--latent-shape` /
`--tiny` shrink it for smoke runs. `--weights` loads converted bundle
params (npz with `unet`/`aekl` trees); without it sampling runs with
random init and the output is explicitly plumbing-only.

Usage:
    python -m generativemodels_tpu.recipes.eval_brain_ldm --tiny \
        --sample-count 4 --out brain_quality.json
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..config import load_preset
from ..metrics import FIDMetric, MultiScaleSSIMMetric
from ..networks.backbones import ResNetFeatures
from ..utils import enable_persistent_compilation_cache
from .brain_ldm_sampler import make_conditioning, sample_brain_ldm
from .eval_quality import ms_ssim_weights_for

BUNDLE_LATENT = (3, 20, 28, 20)  # bundle latent (160/8, 224/8, 160/8)


def make_3d_feature_extractor(weights_path: str | None = None, key=None):
    """MedicalNet-ResNet10-trunk feature fn: (B, 1, D, H, W) -> (B, C)."""
    module = ResNetFeatures(spatial_dims=3, block="basic", layers=(1, 1, 1, 1))
    if weights_path:
        from ..networks.pretrained import _load_state_dict, convert_backbone_state_dict

        params, batch_stats = convert_backbone_state_dict(
            _load_state_dict(weights_path), "medicalnet_resnet10"
        )
    else:
        variables = module.init(key or jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 16, 1)))
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def features(x):
        x_cl = jnp.transpose(x, (0, 2, 3, 4, 1))
        # medicalnet z-score normalisation (reference perceptual.py:210-214)
        x_cl = (x_cl - x_cl.mean()) / (x_cl.std() + 1e-8)
        h = module.apply(
            {"params": params, "batch_stats": batch_stats or {}}, x_cl,
            use_running_average=True,
        )
        return h.mean(axis=(1, 2, 3))

    return features


def main(argv=None) -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--sample-count", type=int, default=8,
                        help="volumes with distinct covariates (diversity set)")
    parser.add_argument("--same-cond-pairs", type=int, default=2,
                        help="extra pairs sharing covariates (4-G metric)")
    parser.add_argument("--ddim-steps", type=int, default=50)
    parser.add_argument("--latent-shape", type=int, nargs=3, default=None,
                        help="override the (3, D, H, W) latent spatial dims")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny nets + latent for CPU smoke runs")
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    parser.add_argument("--weights", type=str, default=None,
                        help="npz with converted bundle params: unet/... aekl/...")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="real .nii volumes for the FID real set")
    parser.add_argument("--fid-weights", type=str, default=None,
                        help="medicalnet_resnet10_23datasets.pth for FID features")
    parser.add_argument("--out", type=str, default="brain_quality.json")
    args = parser.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    preset = load_preset("brain_3d_ldm")
    if args.tiny:
        unet = preset.resolve("network").clone(
            in_channels=3, num_channels=(8, 8), attention_levels=(False, True),
            num_head_channels=8, norm_num_groups=8, dtype=dtype,
        )
        aekl = preset.resolve("autoencoder").clone(
            num_channels=(8, 8), attention_levels=(False, False),
            norm_num_groups=8, dtype=dtype,
        )
        latent_spatial = tuple(args.latent_shape or (4, 4, 4))
    else:
        unet = preset.resolve("network").clone(in_channels=3, dtype=dtype)
        aekl = preset.resolve("autoencoder").clone(dtype=dtype)
        latent_spatial = tuple(args.latent_shape or BUNDLE_LATENT[1:])
    scheduler = preset.resolve("scheduler")
    latent_shape = (1, 3) + latent_spatial

    x_unet = jnp.zeros(latent_shape)
    ctx = jnp.zeros((1, 1, 4))
    decode_in = (1, 1) + tuple(2 * s for s in latent_spatial)
    unet_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(0), x_unet, jnp.zeros((1,), jnp.int32), context=ctx
    )
    aekl_vars = jax.jit(aekl.init)(jax.random.PRNGKey(1), jnp.zeros(decode_in))

    plumbing_only = True
    if args.weights:
        import numpy as np

        loaded = np.load(args.weights, allow_pickle=True)
        trees = loaded["arr_0"].item() if "arr_0" in loaded else dict(loaded)
        unet_vars = {"params": trees["unet"]}
        aekl_vars = {"params": trees["aekl"]}
        plumbing_only = False

    def _sample(uv, av, cond, key):
        def unet_fn(x, t, context=None):
            return unet.apply(uv, x, t, context=context)

        class BoundAekl:
            def decode_stage_2_outputs(self, z):
                return aekl.apply(av, z, method=aekl.decode_stage_2_outputs)

        return sample_brain_ldm(
            unet_fn, BoundAekl(), scheduler, latent_shape,
            gender=cond[0], age=cond[1], ventricular_vol=cond[2],
            brain_vol=cond[3], num_inference_steps=args.ddim_steps, key=key,
        )

    jitted = jax.jit(_sample)

    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    diverse = []
    for i in range(args.sample_count):
        rng, k_cond, k_s = jax.random.split(rng, 3)
        cond = jax.random.uniform(k_cond, (4,))
        diverse.append(jitted(unet_vars, aekl_vars, cond, k_s))
    diverse = jnp.concatenate(diverse).astype(jnp.float32)

    same_groups = []
    for i in range(args.same_cond_pairs):
        rng, k_cond, k_a, k_b = jax.random.split(rng, 4)
        cond = jax.random.uniform(k_cond, (4,))
        same_groups.append((
            jitted(unet_vars, aekl_vars, cond, k_a).astype(jnp.float32),
            jitted(unet_vars, aekl_vars, cond, k_b).astype(jnp.float32),
        ))
    sample_s = time.time() - t0

    size = min(diverse.shape[2:])
    # the 11-tap Wang window needs >= 11 px; tiny smoke volumes shrink it
    win = 11 if size >= 11 else max(3, (size // 2) * 2 - 1)
    ms_ssim = MultiScaleSSIMMetric(
        spatial_dims=3, data_range=float(diverse.max() - diverse.min()) or 1.0,
        weights=ms_ssim_weights_for(size), kernel_size=win,
    )
    half = diverse.shape[0] // 2
    msssim = float(jnp.mean(ms_ssim(diverse[:half], diverse[half : 2 * half])))
    msssim_4g = float(jnp.mean(jnp.asarray([
        jnp.mean(ms_ssim(a, b)) for a, b in same_groups
    ]))) if same_groups else None

    fid = None
    fid_features = None
    if args.data_dir:
        from ..data import batched, training_stream

        # fit real volumes to the generated shape before FID features
        real = jnp.asarray(next(batched(
            training_stream(args.data_dir, tuple(diverse.shape[2:])),
            diverse.shape[0],
        )))[:, None]  # (B, D, H, W) -> (B, 1, D, H, W)
        features = make_3d_feature_extractor(args.fid_weights)
        fid = float(FIDMetric()(features(diverse), features(real)))
        fid_features = args.fid_weights or (
            "random-init medicalnet trunk (not comparable to published FID)"
        )

    result = {
        "preset": "brain_3d_ldm" + (" (tiny)" if args.tiny else ""),
        "published_reference": {
            "fid": 0.0076, "msssim": 0.6555, "4gmsssim": 0.3883,
            "source": "model-zoo brain_image_synthesis_latent_diffusion_model metadata.json:21-25",
        },
        "plumbing_only": plumbing_only,
        "sample_count": int(diverse.shape[0]),
        "same_cond_pairs": args.same_cond_pairs,
        "ddim_steps": args.ddim_steps,
        "latent_shape": list(latent_shape),
        "out_shape": list(diverse.shape),
        "sample_seconds": round(sample_s, 1),
        "msssim": msssim,
        "msssim_4g": msssim_4g,
        "fid": fid,
        "fid_features": fid_features,
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
