"""End-to-end quality loop: train -> sample -> FID / MS-SSIM, one command.

Closes the reference's quality-evaluation loop (BASELINE: FID / MS-SSIM
parity on the MedNIST and brain-MRI tutorial configs; reference numbers at
model-zoo/models/brain_image_synthesis_latent_diffusion_model/configs/
metadata.json:21-25) as a single recipe: when the real datasets are
available this is a `--data-dir` swap, not new code.

Pipeline: train a 2D DDPM at the tutorial scale (synthetic blobs or
`--data-dir`), sample with DDIM, then compute
  - FID between real and sampled image features (ResNet50 trunk,
    global-avg-pooled; pass `--fid-weights` for pretrained features —
    without them the random-projection FID is still a valid two-sample
    discrepancy but not comparable to published numbers), and
  - MS-SSIM diversity over disjoint sample pairs (the brain-LDM bundle's
    diversity metric), with scale weights adapted to the image size.
Results are written as one JSON file.

Usage: python -m generativemodels_tpu.recipes.eval_quality --train-steps 200 --out results.json
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import optax

from ..inferers import DiffusionInferer
from ..metrics import FIDMetric, MultiScaleSSIMMetric
from ..networks.backbones import ResNetFeatures
from ..networks.nets import DiffusionModelUNet
from ..networks.schedulers import DDIMScheduler, DDPMScheduler
from ..parallel import init_train_state, make_diffusion_train_step
from ..utils import enable_persistent_compilation_cache
from .train_2d_ddpm import synthetic_batch


def make_feature_extractor(weights_path: str | None = None, key=None):
    """ResNet50-trunk feature fn: (B, 1|3, H, W) -> (B, 2048)."""
    module = ResNetFeatures(spatial_dims=2, block="bottleneck", layers=(3, 4, 6, 3))
    if weights_path:
        from ..networks.pretrained import convert_backbone_state_dict, _load_state_dict

        params, batch_stats = convert_backbone_state_dict(
            _load_state_dict(weights_path), "resnet50"
        )
    else:
        import warnings

        warnings.warn(
            "make_feature_extractor called without weights_path: the FID "
            "trunk runs with RANDOM ResNet50 weights, so FID values are "
            "only self-consistent within this run — not comparable to any "
            "published number. Supply a converted torchvision resnet50 "
            "checkpoint for real FID.",
            UserWarning,
            stacklevel=2,
        )
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = module.init(key or jax.random.PRNGKey(7), dummy)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def features(x):
        if x.shape[1] == 1:
            x = jnp.repeat(x, 3, axis=1)
        x_cl = jnp.transpose(x, (0, 2, 3, 1))
        h = module.apply(
            {"params": params, "batch_stats": batch_stats}, x_cl,
            use_running_average=True,
        )
        return h.mean(axis=(1, 2))

    return features


def ms_ssim_weights_for(size: int) -> tuple[float, ...]:
    """Truncate the 5-scale Wang weights so the smallest scale fits an
    11-tap kernel (the reference validates this, ms_ssim.py:108-117)."""
    full = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    scales = 1
    while scales < 5 and (size >> scales) >= 11:
        scales += 1
    w = full[:scales]
    return tuple(x / sum(w) for x in w)


def evaluate_quality(
    real: jnp.ndarray,
    samples: jnp.ndarray,
    fid_weights: str | None = None,
) -> dict:
    """FID + MS-SSIM diversity between a real set and a sample set."""
    features = make_feature_extractor(fid_weights)
    fid = float(FIDMetric()(features(samples), features(real)))

    size = real.shape[-1]
    ms_ssim = MultiScaleSSIMMetric(
        spatial_dims=real.ndim - 2, data_range=1.0, weights=ms_ssim_weights_for(size)
    )
    half = samples.shape[0] // 2
    diversity = float(jnp.mean(ms_ssim(samples[:half], samples[half : 2 * half])))
    return {"fid": fid, "ms_ssim_diversity": diversity}


# Pre-registered eval preset (docs/BASELINE_CONFIGS.md "Pre-registered
# quality evals"): the exact MedNIST 2D-DDPM tutorial config
# (reference tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:127-201 —
# UNet(128,256,256) attn (F,T,T) heads 256, b128, lr 2.5e-5, T=1000,
# 75 epochs x ~370 steps ~= 28k steps). With MedNIST at --data-dir and
# pretrained --fid-weights, `fid` and `ms_ssim_diversity` are the
# numbers to compare against a same-protocol run of the reference.
PRESETS: dict[str, dict] = {
    "mednist_2d_ddpm": dict(
        batch=128, size=64, channels=[128, 256, 256], norm_groups=32,
        lr=2.5e-5, train_steps=28000, sample_count=1000, sample_batch=100,
        ddim_steps=50,
    ),
}


def main() -> None:
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=sorted(PRESETS), default=None,
                        help="pin a pre-registered eval config; explicit "
                        "flags still override")
    parser.add_argument("--train-steps", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--size", type=int, default=None)
    parser.add_argument("--channels", type=int, nargs="+", default=None)
    parser.add_argument("--norm-groups", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--sample-count", type=int, default=None)
    parser.add_argument("--sample-batch", type=int, default=None)
    parser.add_argument("--ddim-steps", type=int, default=None)
    parser.add_argument("--solver", choices=["ddim", "dpmsolver", "sde-dpmsolver"],
                        default="ddim",
                        help="dpmsolver = DPM-Solver++ (2M) at --ddim-steps "
                        "steps; sde-dpmsolver = the stochastic variant "
                        "(DDPM-style sample diversity at few steps — "
                        "measured: benchmarks/results_sde_diversity.json)")
    parser.add_argument("--data-dir", type=str, default=None)
    parser.add_argument("--fid-weights", type=str, default=None)
    parser.add_argument("--out", type=str, default="quality_results.json")
    args = parser.parse_args()

    defaults = dict(train_steps=200, batch=64, size=64, channels=[64, 128, 128],
                    norm_groups=32, lr=2.5e-5, sample_count=64, sample_batch=32,
                    ddim_steps=50)
    if args.preset:
        defaults.update(PRESETS[args.preset])
    for k, v in defaults.items():
        if getattr(args, k) is None:
            setattr(args, k, v)

    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=tuple(args.channels),
        attention_levels=(False,) + (True,) * (len(args.channels) - 1),
        num_head_channels=args.channels[-1], norm_num_groups=args.norm_groups,
        dtype=jnp.bfloat16,
    )
    train_scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(args.lr)
    x0 = jnp.zeros((args.batch, 1, args.size, args.size))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32)
    )
    apply = lambda p, x, t: model.apply({"params": p}, x, t)
    step = make_diffusion_train_step(apply, train_scheduler, tx, donate=False)
    state = init_train_state(variables["params"], tx)

    data_iter = None
    if args.data_dir:
        from ..data import device_batches

        data_iter = device_batches(args.data_dir, (args.size,) * 2, args.batch)

    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    loss = jnp.nan
    real_batches = []
    loss_curve = []
    for i in range(args.train_steps):
        rng, k_data, k_step = jax.random.split(rng, 3)
        if data_iter is not None:
            images = next(data_iter)
        else:
            images = synthetic_batch(k_data, args.batch, args.size)
        if len(real_batches) * args.batch < args.sample_count:
            real_batches.append(images)
        state, loss = step(state, images, k_step)
        if (i + 1) % 50 == 0:
            loss_curve.append([i + 1, round(float(loss), 5)])
            print(f"[train] step {i + 1} loss={float(loss):.4f}")
    train_s = time.time() - t0
    real = jnp.concatenate(real_batches)[: args.sample_count]

    # ---- sampling (one lax.scan per batch) -----------------------------------
    if args.solver in ("dpmsolver", "sde-dpmsolver"):
        from ..networks.schedulers import DPMSolverMultistepScheduler

        sched = DPMSolverMultistepScheduler(
            num_train_timesteps=1000,
            algorithm_type="sde-dpmsolver++" if args.solver == "sde-dpmsolver"
            else "dpmsolver++",
        )
    else:
        sched = DDIMScheduler(num_train_timesteps=1000)
    sched.set_timesteps(args.ddim_steps)
    inferer = DiffusionInferer(sched)
    fn = lambda x, t, context=None: model.apply({"params": state.params}, x, t)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))

    t0 = time.time()
    chunks = []
    remaining = args.sample_count
    while remaining > 0:
        n = min(args.sample_batch, remaining)
        rng, k_noise, k_s = jax.random.split(rng, 3)
        noise = jax.random.normal(k_noise, (args.sample_batch, 1, args.size, args.size))
        chunks.append(sample(noise, k_s)[:n])
        remaining -= n
    samples = jnp.concatenate(chunks)
    sample_s = time.time() - t0

    metrics = evaluate_quality(real, samples, fid_weights=args.fid_weights)
    result = {
        "preset": args.preset,
        "config": f"2D DDPM {tuple(args.channels)} b{args.batch} {args.size}px "
                  f"T=1000 {args.solver.upper()}-{args.ddim_steps}",
        "data": args.data_dir or "synthetic blobs",
        "train_steps": args.train_steps,
        "final_train_loss": float(loss),
        "loss_curve": loss_curve,
        "train_seconds": round(train_s, 1),
        "sample_count": int(samples.shape[0]),
        "sample_seconds": round(sample_s, 1),
        "fid_features": args.fid_weights or "random-init resnet50 trunk (not comparable to published FID)",
        **metrics,
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
