"""Headline benchmarks: 2D DDPM train throughput + 3D 128^3 DDIM sampling.

Measures (a) our jitted TPU train step (DiffusionModelUNet (128, 256, 256),
attention at the two coarse levels, batch 128, 64x64, T=1000 — the exact
config of reference tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:166-177)
against a measured PyTorch-CPU reference on this host, and (b) 3D 128^3
DDIM-50 sampling (the BASELINE.json north-star metric) against the documented
A100-PyTorch analytic proxy (benchmarks/A100_PROXY.md — the reference
publishes no throughput numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"metrics": [both entries]}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import optax

from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDPMScheduler
from generativemodels_tpu.parallel import init_train_state, make_diffusion_train_step

BATCH = 128
SIZE = 64
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def measure_tpu_steps_per_sec(warmup: int = 3, steps: int = 20) -> float:
    # bf16 compute dtype: the reference tutorial trains under AMP autocast
    # (2d_ddpm_tutorial.py), so mixed precision is the parity configuration
    model = DiffusionModelUNet(
        spatial_dims=2,
        in_channels=1,
        out_channels=1,
        num_res_blocks=1,
        num_channels=(128, 256, 256),
        attention_levels=(False, True, True),
        num_head_channels=256,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((BATCH, 1, SIZE, SIZE))
    # jit the init: eager init dispatches hundreds of individual ops, which
    # is pathological through a remote-dispatch TPU tunnel
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((BATCH,), jnp.int32))
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = make_diffusion_train_step(apply, scheduler, tx)
    state = init_train_state(variables["params"], tx)

    images = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 1, SIZE, SIZE))
    rng = jax.random.PRNGKey(2)
    for _ in range(warmup):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)  # host fetch: block_until_ready does not sync through the tunnel

    t0 = time.time()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    return steps / (time.time() - t0)


def measure_3d_ddim_samples_per_min(runs: int = 3) -> dict:
    """3D 128^3 DDIM-50 sampling, one lax.scan program (benchmarks/bench_3d_ddim.py)."""
    from generativemodels_tpu.inferers import DiffusionInferer
    from generativemodels_tpu.networks.schedulers import DDIMScheduler

    model = DiffusionModelUNet(
        spatial_dims=3,
        in_channels=1,
        out_channels=1,
        num_res_blocks=1,
        num_channels=(32, 64, 128),
        attention_levels=(False, False, True),
        num_head_channels=64,
        norm_num_groups=32,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 1, 128, 128, 128))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    scheduler = DDIMScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(50)
    inferer = DiffusionInferer(scheduler)
    fn = lambda xx, tt, context=None: model.apply(variables, xx, tt)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    float(jnp.sum(sample(noise, jax.random.PRNGKey(2))))  # compile + true sync
    t0 = time.time()
    for i in range(runs):
        img = sample(noise, jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))  # host fetch: block_until_ready does not sync through the tunnel
    per_sample = (time.time() - t0) / runs
    # A100-PyTorch point proxy with documented assumptions: benchmarks/A100_PROXY.md
    a100_proxy = 9.0
    value = 60.0 / per_sample
    return {
        "metric": "3d_128_ddim50_samples_per_min_per_chip",
        "value": round(value, 3),
        "unit": "samples/min",
        "vs_baseline": round(value / a100_proxy, 2),
        "baseline": a100_proxy,
        "baseline_context": "analytic A100 torch-eager proxy (benchmarks/A100_PROXY.md; no published reference numbers)",
        "config": "3D UNet(32,64,128) bf16, 128^3, DDIM-50, batch 1",
    }


def measure_3d_dpmsolver_samples_per_min(runs: int = 3) -> dict:
    """3D 128^3 DPM-Solver++ (2M) 10-step sampling (benchmarks/bench_fast_solver.py).

    The beyond-reference fast solver: measured 0.9988 MS-SSIM agreement
    with the DDIM-200 ODE endpoint (better than DDIM-50's 0.9851) at
    4.6x DDIM-50's throughput — results_fast_solver.json.
    """
    from generativemodels_tpu.inferers import DiffusionInferer
    from generativemodels_tpu.networks.schedulers import DPMSolverMultistepScheduler

    model = DiffusionModelUNet(
        spatial_dims=3,
        in_channels=1,
        out_channels=1,
        num_res_blocks=1,
        num_channels=(32, 64, 128),
        attention_levels=(False, False, True),
        num_head_channels=64,
        norm_num_groups=32,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 1, 128, 128, 128))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    scheduler = DPMSolverMultistepScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(10)
    inferer = DiffusionInferer(scheduler)
    fn = lambda xx, tt, context=None: model.apply(variables, xx, tt)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    float(jnp.sum(sample(noise, jax.random.PRNGKey(2))))  # compile + true sync
    t0 = time.time()
    for i in range(runs):
        img = sample(noise, jax.random.PRNGKey(3 + i))
    float(jnp.sum(img))
    per_sample = (time.time() - t0) / runs
    value = 60.0 / per_sample
    return {
        "metric": "3d_128_dpmsolver10_samples_per_min_per_chip",
        "value": round(value, 3),
        "unit": "samples/min",
        "vs_baseline": None,
        "baseline_context": "no reference analogue (the reference ships no fast solver); "
        "fidelity evidence in benchmarks/results_fast_solver.json",
        "config": "3D UNet(32,64,128) bf16, 128^3, DPM-Solver++(2M)-10, batch 1",
    }


def measure_3d_train_steps_per_sec(warmup: int = 3, steps: int = 10) -> dict:
    """3D 128^3 DDPM train step, batch 1 (benchmarks/bench_3d_train.py).

    The reference's 3D tutorial needs ~21 GB GPU at batch 8 on *downsampled*
    BraTS (tutorials/generative/3d_ddpm/3d_ddpm_tutorial.py:109); this config
    trains full 128^3 on one 16 GB v5e chip, no remat (results_3d_remat.json).
    """
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
        use_checkpointing=False,
    )
    from generativemodels_tpu.parallel import init_train_state as _init_ts
    from generativemodels_tpu.parallel import make_diffusion_train_step as _mk_step

    x = jnp.zeros((1, 1, 128, 128, 128))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    scheduler = DDPMScheduler(num_train_timesteps=1000)
    tx = optax.adam(2.5e-5)
    apply = lambda p, xx, tt: model.apply({"params": p}, xx, tt)
    step = _mk_step(apply, scheduler, tx)
    state = _init_ts(variables["params"], tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), x.shape)
    rng = jax.random.PRNGKey(2)
    for _ in range(warmup):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, images, sub)
    float(loss)
    value = steps / (time.time() - t0)
    return {
        "metric": "3d_128_train_steps_per_sec",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "baseline_context": "reference 3D tutorial cannot run this shape on one GPU "
        "(needs ~21 GB at batch 8 on downsampled volumes); history in benchmarks/results_3d_train.json",
        "config": "3D UNet(32,64,128) bf16 b1 128^3 no-remat",
    }


def measure_3d_ldm_samples_per_min(runs: int = 3) -> dict:
    """Latent-3D route at 128^3: latent DDIM-50 + AEKL decode in one program
    (benchmarks/bench_3d_ldm.py — the configuration family the reference's
    model-zoo bundles actually ship, e.g. brain_image_synthesis_ldm)."""
    from generativemodels_tpu.inferers import LatentDiffusionInferer
    from generativemodels_tpu.networks.nets import AutoencoderKL
    from generativemodels_tpu.networks.schedulers import DDIMScheduler

    aekl = AutoencoderKL(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 64), attention_levels=(False, False, False),
        latent_channels=3, norm_num_groups=32, with_encoder_nonlocal_attn=False,
        with_decoder_nonlocal_attn=False, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 1, 128, 128, 128))
    a_vars = jax.jit(aekl.init)(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
    bound = aekl.bind(a_vars, rngs={"sampling": jax.random.PRNGKey(2)})

    unet = DiffusionModelUNet(
        spatial_dims=3, in_channels=3, out_channels=3, num_res_blocks=2,
        num_channels=(64, 128, 256), attention_levels=(False, True, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16)
    z = jnp.zeros((1, 3, 32, 32, 32))
    u_vars = jax.jit(unet.init)(jax.random.PRNGKey(3), z, jnp.zeros((1,), jnp.int32))
    fn = lambda xx, tt, context=None: unet.apply(u_vars, xx, tt)

    sched = DDIMScheduler(num_train_timesteps=1000)
    sched.set_timesteps(50)
    inf = LatentDiffusionInferer(sched, scale_factor=0.3)
    sample = jax.jit(lambda noise, key: inf.sample(noise, bound, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(4), z.shape)
    float(jnp.sum(sample(noise, jax.random.PRNGKey(5))))  # compile + sync
    t0 = time.time()
    for i in range(runs):
        img = sample(noise, jax.random.PRNGKey(6 + i))
    float(jnp.sum(img))
    value = 60.0 / ((time.time() - t0) / runs)
    return {
        "metric": "3d_128_ldm_ddim50_samples_per_min_per_chip",
        "value": round(value, 3),
        "unit": "samples/min",
        "vs_baseline": None,
        "baseline_context": "latent route (model-zoo bundle configuration family); "
        "A100 framing in benchmarks/A100_PROXY.md",
        "config": "AEKL(32,64,64) 4x-down + UNet(64,128,256)@32^3 latent, bf16, DDIM-50",
    }


def torch_cpu_baseline() -> float:
    """Measured-once PyTorch-CPU steps/sec for the same config (cached)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_steps_per_sec"]
    from benchmarks.torch_baseline import measure_torch_cpu_steps_per_sec

    value = measure_torch_cpu_steps_per_sec(batch=BATCH, size=SIZE)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_steps_per_sec": value, "config": "2d_ddpm_mednist_b128_64px"}, f)
    return value


def _probe_device(timeout_s: int = 120) -> bool:
    """First-touch the backend in a SUBPROCESS with a hard timeout.

    In the tunnel's total-outage mode (observed 2026-08-17) backend init
    doesn't fail fast — it *hangs* ~20 min in-process before returning
    UNAVAILABLE. A bounded subprocess probe turns that into a 2-minute
    check per attempt.
    """
    import signal
    import subprocess

    code = "import jax, jax.numpy as jnp; jax.devices(); print(float(jnp.zeros(()) + 1.0))"
    # DEVNULL + start_new_session: a killed probe must not leave us
    # draining pipes held open by tunnel-helper grandchildren
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                            start_new_session=True)
    try:
        return proc.wait(timeout=timeout_s) == 0
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()
        return False


def _ensure_backend(max_tries: int = 40, sleep_s: int = 75) -> None:
    """Survive transient tunnel outages at measurement time.

    The axon TPU tunnel can return UNAVAILABLE (or hang init) for tens of
    minutes at a stretch (a >1.5 h outage was observed 2026-08-18). jax
    caches a failed backend init for the process lifetime, so on a failed
    bounded probe we sleep and re-exec this script fresh — up to
    ~max_tries*(sleep_s+probe timeout), ~2 h — before proceeding and
    letting the in-process init try its luck.
    """
    if _probe_device():
        return
    tries = int(os.environ.get("GMTPU_BENCH_TRIES", "0"))
    if tries >= max_tries:
        return  # last resort: attempt in-process; main() reports any error
    time.sleep(sleep_s)
    os.environ["GMTPU_BENCH_TRIES"] = str(tries + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    _ensure_backend()
    value = measure_tpu_steps_per_sec()
    try:
        baseline = torch_cpu_baseline()
    except Exception:
        baseline = None
    result = {
        "metric": "2d_ddpm_train_steps_per_sec",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "baseline": round(baseline, 4) if baseline else None,
        "baseline_context": "pytorch-cpu same host, same tutorial config (no published reference numbers)",
        "config": f"DiffusionModelUNet(128,256,256) bf16 b{BATCH} {SIZE}x{SIZE} T=1000",
        "backend": jax.default_backend(),
    }
    try:
        metric_3d = measure_3d_ddim_samples_per_min()
    except Exception as exc:  # e.g. CPU-only environment: 3D 128^3 infeasible
        metric_3d = {"metric": "3d_128_ddim50_samples_per_min_per_chip", "error": str(exc)[:200]}
    try:
        metric_dpm = measure_3d_dpmsolver_samples_per_min()
    except Exception as exc:
        metric_dpm = {"metric": "3d_128_dpmsolver10_samples_per_min_per_chip", "error": str(exc)[:200]}
    try:
        metric_3d_train = measure_3d_train_steps_per_sec()
    except Exception as exc:
        metric_3d_train = {"metric": "3d_128_train_steps_per_sec", "error": str(exc)[:200]}
    try:
        metric_ldm = measure_3d_ldm_samples_per_min()
    except Exception as exc:
        metric_ldm = {"metric": "3d_128_ldm_ddim50_samples_per_min_per_chip", "error": str(exc)[:200]}
    result["metrics"] = [
        {k: result[k] for k in ("metric", "value", "unit", "vs_baseline", "baseline", "config")},
        metric_3d,
        metric_dpm,
        metric_3d_train,
        metric_ldm,
    ]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
