"""Trained-field solver fidelity on the LATENT route.

The 996-samples/min latent x DPM-Solver++ headline
(results_3d_ldm_dpm.json) measures throughput with random weights; the
solver's fidelity evidence so far is direct-space
(results_fast_solver.json: 0.9988 MS-SSIM vs the DDIM-200 endpoint on a
trained field). This closes the loop on the latent route itself, at a
scale that trains in minutes on-chip:

1. train a tiny AEKL stage 1 (L1 + KL, no GAN) on synthetic blobs,
2. train a latent DDPM on its (frozen-encoder) latents,
3. sample the SAME noise through DDIM-200 (near-converged ODE endpoint),
   DDIM-50 and DPM-Solver++(2M)-10, decode, and report MS-SSIM agreement
   of the DECODED images plus per-route sampling time.

Writes benchmarks/results_latent_solver_fidelity.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import optax

from generativemodels_tpu.inferers import LatentDiffusionInferer
from generativemodels_tpu.metrics import MultiScaleSSIMMetric
from generativemodels_tpu.networks.nets import AutoencoderKL, DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
)
from generativemodels_tpu.parallel import init_train_state, make_diffusion_train_step
from generativemodels_tpu.recipes.train_2d_ddpm import synthetic_batch

BATCH, SIZE, LAT_CH = 32, 64, 3
AEKL_STEPS, DDPM_STEPS = 400, 1500
SCALE_FACTOR = 1.0


def main() -> None:
    aekl = AutoencoderKL(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64), attention_levels=(False, False),
        latent_channels=LAT_CH, norm_num_groups=32,
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
    )
    x0 = jnp.zeros((BATCH, 1, SIZE, SIZE))
    a_vars = jax.jit(aekl.init)(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x0
    )
    a_tx = optax.adam(1e-3)
    a_opt = a_tx.init(a_vars["params"])

    @jax.jit
    def aekl_step(params, opt_state, x, key):
        def loss_fn(p):
            recon, z_mu, z_sigma = aekl.apply(
                {"params": p}, x, rngs={"sampling": key}
            )
            l1 = jnp.mean(jnp.abs(recon - x))
            kl = 0.5 * jnp.mean(z_mu**2 + z_sigma**2 - jnp.log(z_sigma**2) - 1)
            return l1 + 1e-4 * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = a_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(42)
    t0 = time.time()
    a_params = a_vars["params"]
    for i in range(AEKL_STEPS):
        rng, kd, ks = jax.random.split(rng, 3)
        x = synthetic_batch(kd, BATCH, SIZE) * 2 - 1
        a_params, a_opt, a_loss = aekl_step(a_params, a_opt, x, ks)
    stage1_s = time.time() - t0

    # ---- stage 2: latent DDPM on frozen-encoder latents --------------------
    lat_hw = SIZE // 2
    unet = DiffusionModelUNet(
        spatial_dims=2, in_channels=LAT_CH, out_channels=LAT_CH,
        num_res_blocks=1, num_channels=(64, 128), attention_levels=(False, True),
        num_head_channels=64, norm_num_groups=32,
    )
    z0 = jnp.zeros((BATCH, LAT_CH, lat_hw, lat_hw))
    u_vars = jax.jit(unet.init)(
        jax.random.PRNGKey(2), z0, jnp.zeros((BATCH,), jnp.int32)
    )
    sched = DDPMScheduler(num_train_timesteps=1000)
    u_tx = optax.adam(2.5e-4)
    apply = lambda p, z, t: unet.apply({"params": p}, z, t)
    u_step = make_diffusion_train_step(apply, sched, u_tx, donate=False)
    u_state = init_train_state(u_vars["params"], u_tx)

    @jax.jit
    def encode(params, x, key):
        z_mu, z_sigma = aekl.apply({"params": params}, x, method="encode")
        eps = jax.random.normal(key, z_sigma.shape)
        return (z_mu + eps * z_sigma) * SCALE_FACTOR

    t0 = time.time()
    for i in range(DDPM_STEPS):
        rng, kd, ke, ks = jax.random.split(rng, 4)
        x = synthetic_batch(kd, BATCH, SIZE) * 2 - 1
        u_state, u_loss = u_step(u_state, encode(a_params, x, ke), ks)
    stage2_s = time.time() - t0

    # ---- 3: same-noise sampling through the three solvers ------------------
    bound = aekl.bind({"params": a_params}, rngs={"sampling": jax.random.PRNGKey(3)})
    fn = lambda z, t, context=None: apply(u_state.params, z, t)
    noise = jax.random.normal(jax.random.PRNGKey(4), (16, LAT_CH, lat_hw, lat_hw))

    routes = {}
    decoded = {}
    for label, sch, steps in (
        ("ddim200", DDIMScheduler(num_train_timesteps=1000, clip_sample=False), 200),
        ("ddim50", DDIMScheduler(num_train_timesteps=1000, clip_sample=False), 50),
        ("dpmsolver10", DPMSolverMultistepScheduler(num_train_timesteps=1000), 10),
    ):
        sch.set_timesteps(steps)
        inf = LatentDiffusionInferer(sch, scale_factor=SCALE_FACTOR)
        sample = jax.jit(lambda nz, key, _inf=inf: _inf.sample(nz, bound, fn, key=key))
        img = sample(noise, jax.random.PRNGKey(5))
        float(jnp.sum(img))  # compile+sync
        t0 = time.time()
        img = sample(noise, jax.random.PRNGKey(5))
        float(jnp.sum(img))
        routes[label] = {"steps": steps, "seconds": round(time.time() - t0, 3)}
        decoded[label] = img

    ms = MultiScaleSSIMMetric(spatial_dims=2, data_range=2.0, weights=(0.33, 0.33, 0.34))
    agree = lambda a, b: float(jnp.mean(ms(decoded[a], decoded[b])))
    result = {
        "metric": "latent_route_solver_fidelity",
        "stage1_train_s": round(stage1_s, 1),
        "stage2_train_s": round(stage2_s, 1),
        "final_aekl_loss": round(float(a_loss), 5),
        "final_ddpm_loss": round(float(u_loss), 5),
        "routes": routes,
        "ms_ssim_ddim50_vs_ddim200": agree("ddim50", "ddim200"),
        "ms_ssim_dpm10_vs_ddim200": agree("dpmsolver10", "ddim200"),
        "config": f"AEKL(32,64) {LAT_CH}ch latent + UNet(64,128), {SIZE}px, "
                  f"trained {AEKL_STEPS}+{DDPM_STEPS} steps on synthetic blobs",
        "backend": jax.default_backend(),
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_latent_solver_fidelity.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
