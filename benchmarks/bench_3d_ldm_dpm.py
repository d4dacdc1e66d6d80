"""Latent-3D route x DPM-Solver++(2M)-10: both beyond-reference
multipliers stacked — the zoo-bundle configuration family
(bench_3d_ldm.py) sampled with the fast solver (bench_fast_solver.py).

The per-sample cost is 10 latent UNet evals + 1 AEKL decode, vs the
reference bundle's 50 evals + decode of the same nets."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from generativemodels_tpu.inferers import LatentDiffusionInferer
from generativemodels_tpu.networks.nets import AutoencoderKL, DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DPMSolverMultistepScheduler

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

sched = DPMSolverMultistepScheduler(num_train_timesteps=1000)
sched.set_timesteps(10)
inf = LatentDiffusionInferer(sched, scale_factor=0.3)

sample = jax.jit(lambda noise, key: inf.sample(noise, bound, fn, key=key))
noise = jax.random.normal(jax.random.PRNGKey(4), z.shape)
t0 = time.time(); img = sample(noise, jax.random.PRNGKey(5)); float(jnp.sum(img))
compile_s = time.time() - t0
t0 = time.time()
for i in range(5):
    img = sample(noise, jax.random.PRNGKey(6 + i))
float(jnp.sum(img))  # host fetch syncs through the tunnel
per = (time.time() - t0) / 5
out = {"metric": "3d_128_LDM_dpmsolver10_samples_per_min", "value": round(60 / per, 2),
       "seconds_per_sample": round(per, 3), "compile_s": round(compile_s, 1),
       "config": "AEKL(32,64,64) 4x-down + UNet(64,128,256)@32^3 latent, bf16, DPM-Solver++(2M)-10",
       "out_shape": list(img.shape)}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_3d_ldm_dpm.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
