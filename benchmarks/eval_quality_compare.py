"""Tiny-scale identical-protocol quality comparison vs the torch reference.

Runs the SAME train->sample->evaluate protocol in both frameworks:
identical synthetic data stream, identical config (2D DDPM (32,64),
b16, 32px, T=1000, 300 steps, DDIM-50, 32 samples), each framework
training its own net from its own default init, and ONE shared metric
stack (recipes/eval_quality.evaluate_quality) scoring both sample sets
against the same real set. Torch runs the live reference
(generative/networks/nets/diffusion_model_unet.py + inferers) on CPU;
this framework runs on whatever backend is attached (TPU under axon).

Writes/updates benchmarks/results_eval_quality.json with one row per
framework. Reference surface for the protocol:
tutorials/generative/realism_diversity_metrics/realism_diversity_metrics.py
(FID + MS-SSIM over generated vs real sets).

Usage: python benchmarks/eval_quality_compare.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # identical protocol on the CPU backend (e.g. when the TPU tunnel is
    # unavailable); the distribution metrics are backend-independent —
    # only the recorded wall times change
    import jax

    jax.config.update("jax_platforms", "cpu")

TRAIN_STEPS = 300
BATCH = 16
SIZE = 32
CHANNELS = (32, 64)
NORM_GROUPS = 32
LR = 2.5e-4
SAMPLES = 32
DDIM_STEPS = 50
T = 1000
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_eval_quality.json")


def make_data() -> np.ndarray:
    """(TRAIN_STEPS, B, 1, S, S) synthetic blob batches, shared verbatim."""
    import jax

    from generativemodels_tpu.recipes.train_2d_ddpm import synthetic_batch

    key = jax.random.PRNGKey(123)
    batches = []
    for i in range(TRAIN_STEPS):
        key, sub = jax.random.split(key)
        batches.append(np.asarray(synthetic_batch(sub, BATCH, SIZE)))
    return np.stack(batches).astype(np.float32)


def run_jax(data: np.ndarray) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from generativemodels_tpu.inferers import DiffusionInferer
    from generativemodels_tpu.networks.nets import DiffusionModelUNet
    from generativemodels_tpu.networks.schedulers import DDIMScheduler, DDPMScheduler
    from generativemodels_tpu.parallel import init_train_state, make_diffusion_train_step

    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=CHANNELS, attention_levels=(False, True),
        num_head_channels=CHANNELS[-1], norm_num_groups=NORM_GROUPS,
    )
    sched = DDPMScheduler(num_train_timesteps=T)
    tx = optax.adam(LR)
    x0 = jnp.zeros((BATCH, 1, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((BATCH,), jnp.int32)
    )
    apply = lambda p, x, t: model.apply({"params": p}, x, t)
    step = make_diffusion_train_step(apply, sched, tx, donate=False)
    state = init_train_state(variables["params"], tx)

    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    curve = []
    for i in range(TRAIN_STEPS):
        rng, k = jax.random.split(rng)
        state, loss = step(state, jnp.asarray(data[i]), k)
        if (i + 1) % 50 == 0:
            curve.append([i + 1, round(float(loss), 5)])
    train_s = time.time() - t0

    ddim = DDIMScheduler(num_train_timesteps=T)
    ddim.set_timesteps(DDIM_STEPS)
    inferer = DiffusionInferer(ddim)
    fn = lambda x, t, context=None: model.apply({"params": state.params}, x, t)
    t0 = time.time()
    noise = jax.random.normal(jax.random.PRNGKey(7), (SAMPLES, 1, SIZE, SIZE))
    samples = jax.jit(lambda nz, k: inferer.sample(nz, fn, key=k))(
        noise, jax.random.PRNGKey(8)
    )
    samples.block_until_ready()
    sample_s = time.time() - t0
    return {
        "framework": f"generativemodels_tpu ({jax.default_backend()})",
        "train_seconds": round(train_s, 1),
        "sample_seconds": round(sample_s, 1),
        "loss_curve": curve,
        "samples": np.asarray(samples),
    }


def run_torch(data: np.ndarray) -> dict:
    import torch

    from tests.ref_loader import load_reference_inferers, load_reference_nets, load_reference_schedulers

    ref_nets = load_reference_nets()
    ref_sched = load_reference_schedulers()
    ref_inf = load_reference_inferers()

    torch.manual_seed(0)
    model = ref_nets.DiffusionModelUNet(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=CHANNELS, attention_levels=(False, True),
        num_head_channels=CHANNELS[-1], norm_num_groups=NORM_GROUPS,
    )
    sched = ref_sched.DDPMScheduler(num_train_timesteps=T)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    model.train()
    g = torch.Generator().manual_seed(42)
    t0 = time.time()
    curve = []
    for i in range(TRAIN_STEPS):
        x0 = torch.from_numpy(data[i])
        noise = torch.randn(x0.shape, generator=g)
        tsteps = torch.randint(0, T, (BATCH,), generator=g)
        x_t = sched.add_noise(x0, noise, tsteps)
        pred = model(x_t, tsteps)
        loss = torch.nn.functional.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (i + 1) % 50 == 0:
            curve.append([i + 1, round(loss.item(), 5)])
    train_s = time.time() - t0

    ddim = ref_sched.DDIMScheduler(num_train_timesteps=T)
    ddim.set_timesteps(DDIM_STEPS)
    inferer = ref_inf.DiffusionInferer(ddim)
    model.eval()
    t0 = time.time()
    with torch.no_grad():
        noise = torch.randn((SAMPLES, 1, SIZE, SIZE), generator=g)
        samples = inferer.sample(
            input_noise=noise, diffusion_model=model, scheduler=ddim, verbose=False
        )
    sample_s = time.time() - t0
    return {
        "framework": "reference torch (cpu)",
        "train_seconds": round(train_s, 1),
        "sample_seconds": round(sample_s, 1),
        "loss_curve": curve,
        "samples": samples.detach().numpy(),
    }


def main() -> None:
    import jax.numpy as jnp

    from generativemodels_tpu.recipes.eval_quality import evaluate_quality

    data = make_data()
    real = jnp.asarray(data[:max(1, SAMPLES // BATCH)].reshape(-1, 1, SIZE, SIZE))

    rows = []
    for runner in (run_jax, run_torch):
        r = runner(data)
        metrics = evaluate_quality(real, jnp.asarray(r.pop("samples")))
        rows.append({
            **r,
            **metrics,
            "config": f"2D DDPM {CHANNELS} b{BATCH} {SIZE}px T={T} "
                      f"{TRAIN_STEPS} steps DDIM-{DDIM_STEPS}, {SAMPLES} samples",
            "note": "identical synthetic data + shared metric stack "
                    "(random-trunk FID: self-consistent within this file only)",
        })
        print(json.dumps(rows[-1]))

    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    existing["tiny_scale_comparison"] = rows
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
