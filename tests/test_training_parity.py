"""Training-dynamics parity: N optimizer steps in both frameworks.

Per-op goldens can't catch wrong init distributions, mis-wired time
embeddings, or silent broadcasts that only show up through the optimizer
loop. This test trains the SAME tiny 2D DDPM config in torch (the
reference loop shape, tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:
196-233) and in this framework, from converted-identical init, on
identical data with injected identical noise/timestep streams, and
asserts the loss trajectories agree.

Optimizer-math note: torch.optim.Adam and optax.adam place eps the same
way (outside the sqrt: step = lr * m_hat / (sqrt(v_hat) + eps)), so the
update rules are algebraically identical; the only divergence source is
floating-point accumulation order (XLA vs ATen reductions). Measured
drift at this config: step-0 losses differ by 1.7e-5 (pure forward
noise), growing to 1.1e-4 max relative by step 60 — the asserted
rtol=2e-3 leaves ~20x headroom.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from generativemodels_tpu.networks import zoo_convert as zc  # noqa: E402
from generativemodels_tpu.networks.nets.diffusion_model_unet import (  # noqa: E402
    DiffusionModelUNet,
)
from generativemodels_tpu.networks.schedulers import DDPMScheduler  # noqa: E402

from .ref_loader import load_reference_nets, load_reference_schedulers

ref_nets = load_reference_nets()
ref_schedulers = load_reference_schedulers()

pytestmark = pytest.mark.skipif(
    ref_nets is None or ref_schedulers is None,
    reason="torch reference could not be imported",
)

CFG = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    num_res_blocks=(1, 1),
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=4,
)
T = 1000
LR = 2.5e-5  # reference tutorial's Adam lr (2d_ddpm_tutorial.py:190)
STEPS = 60
BATCH = 4
SIZE = 16


def _streams():
    rs = np.random.RandomState(0)
    data = rs.rand(STEPS, BATCH, 1, SIZE, SIZE).astype(np.float32)
    noise = rs.randn(STEPS, BATCH, 1, SIZE, SIZE).astype(np.float32)
    tsteps = rs.randint(0, T, size=(STEPS, BATCH)).astype(np.int64)
    return data, noise, tsteps


@pytest.mark.slow
def test_ddpm_loss_trajectory_matches_reference():
    model = DiffusionModelUNet(**CFG)
    struct = zc.params_structure(
        model, jnp.zeros((BATCH, 1, SIZE, SIZE)), jnp.zeros((BATCH,), jnp.int32)
    )
    # converted-identical init: both sides start from the torch net's own
    # (reference-default) init distribution
    torch.manual_seed(0)
    ref2 = ref_nets.DiffusionModelUNet(**CFG)
    params = zc.convert_diffusion_model_unet(ref2.state_dict(), struct)
    # force copies BEFORE the torch loop runs: converted 1-D leaves (norm
    # scales/biases) can be numpy VIEWS of live torch storage, so the torch
    # optimizer steps below would otherwise mutate the jax side's init
    params = jax.tree.map(lambda a: jnp.array(np.array(a)), params)

    sched_t = ref_schedulers.DDPMScheduler(num_train_timesteps=T)
    opt_t = torch.optim.Adam(ref2.parameters(), lr=LR)
    data, noise, tsteps = _streams()
    torch_losses = []
    ref2.train()
    for s in range(STEPS):
        x_t = sched_t.add_noise(
            torch.from_numpy(data[s]), torch.from_numpy(noise[s]),
            torch.from_numpy(tsteps[s]),
        )
        pred = ref2(x_t, torch.from_numpy(tsteps[s]))
        loss = torch.nn.functional.mse_loss(pred, torch.from_numpy(noise[s]))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        torch_losses.append(loss.item())

    sched = DDPMScheduler(num_train_timesteps=T)
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x0, eps, t):
        x_t = sched.add_noise(x0, eps, t)

        def loss_fn(p):
            pred = model.apply({"params": p}, x_t, t)
            return jnp.mean((pred - eps) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    jax_losses = []
    for s in range(STEPS):
        params, opt_state, loss = train_step(
            params,
            opt_state,
            jnp.asarray(data[s]),
            jnp.asarray(noise[s]),
            jnp.asarray(tsteps[s].astype(np.int32)),
        )
        jax_losses.append(float(loss))

    jax_losses = np.asarray(jax_losses)
    torch_losses = np.asarray(torch_losses)
    # identical math, fp32: only accumulation-order noise separates them.
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-4)
    # and the loop actually learns (loss drops vs the first few steps)
    assert jax_losses[-10:].mean() < jax_losses[:10].mean()
