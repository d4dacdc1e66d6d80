"""End-to-end inferer goldens: reference torch DiffusionInferer vs the
TPU-native one, through a CONVERTED-identical tiny UNet.

These close the gap per-op goldens cannot: the full `get_likelihood`
program (T KL terms + discretised decoder NLL, reference
inferers/inferer.py:145-270) and the full deterministic DDIM sampling
trajectory (reference :83-143) are compared as single scalars/tensors, so
any wiring drift anywhere in the scheduler/inferer/net stack surfaces.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from generativemodels_tpu.inferers import DiffusionInferer  # noqa: E402
from generativemodels_tpu.networks import zoo_convert as zc  # noqa: E402
from generativemodels_tpu.networks.nets import DiffusionModelUNet  # noqa: E402
from generativemodels_tpu.networks.schedulers import (  # noqa: E402
    DDIMScheduler,
    DDPMScheduler,
)

from .ref_loader import (
    load_reference_inferers,
    load_reference_nets,
    load_reference_schedulers,
)

ref_nets = load_reference_nets()
ref_inf = load_reference_inferers()
ref_sched = load_reference_schedulers()

pytestmark = pytest.mark.skipif(
    ref_nets is None or ref_inf is None or ref_sched is None,
    reason="torch reference could not be imported",
)

CFG = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    num_res_blocks=1,
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=8,
)


def _converted_pair(seed=0):
    """(torch UNet, flax apply-fn) with identical random weights."""
    ref = ref_nets.DiffusionModelUNet(**CFG)
    ref.eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    model = DiffusionModelUNet(**CFG)
    struct = zc.params_structure(
        model, jnp.zeros((2, 1, 16, 16)), jnp.zeros((2,), jnp.int32)
    )
    params = zc.convert_diffusion_model_unet(ref.state_dict(), struct)

    def fn(x, timesteps, context=None):
        return model.apply({"params": params}, x, timesteps, context=context)

    return ref, fn


class TestLikelihoodGolden:
    def test_get_likelihood_total_and_maps(self):
        ref_model, fn = _converted_pair()
        rs = np.random.RandomState(5)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)  # in scaled range (0,1)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)

        t_sched = ref_sched.DDPMScheduler(num_train_timesteps=10)
        t_inferer = ref_inf.DiffusionInferer(t_sched)
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda t, *a, **k: torch.from_numpy(noise).to(t.dtype)
        try:
            with torch.no_grad():
                total_t, maps_t = t_inferer.get_likelihood(
                    torch.from_numpy(x),
                    ref_model,
                    save_intermediates=True,
                    verbose=False,
                )
        finally:
            torch.randn_like = orig_randn_like

        f_sched = DDPMScheduler(num_train_timesteps=10)
        f_inferer = DiffusionInferer(f_sched)
        total_f, maps_f = f_inferer.get_likelihood(
            jnp.asarray(x), fn, save_intermediates=True, noise=jnp.asarray(noise)
        )

        np.testing.assert_allclose(
            np.asarray(total_f), total_t.numpy(), rtol=1e-4, atol=1e-4,
            err_msg="per-image ELBO total",
        )
        assert len(maps_f) == len(maps_t)
        for i, (a, b) in enumerate(zip(maps_f, maps_t)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-5,
                err_msg=f"KL map at step {i}",
            )


class TestSampleGolden:
    def test_ddim_deterministic_trajectory(self):
        """eta=0 DDIM from identical initial noise: the whole 10-step
        reverse trajectory must agree (reference inferer.py:83-143 +
        ddim.py:156-237)."""
        ref_model, fn = _converted_pair(seed=1)
        rs = np.random.RandomState(6)
        x_t = rs.randn(1, 1, 16, 16).astype(np.float32)

        t_sched = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_sched.set_timesteps(10)
        t_inferer = ref_inf.DiffusionInferer(t_sched)
        with torch.no_grad():
            out_t = t_inferer.sample(
                torch.from_numpy(x_t), ref_model, scheduler=t_sched, verbose=False
            )

        f_sched = DDIMScheduler(num_train_timesteps=1000)
        f_sched.set_timesteps(10)
        f_inferer = DiffusionInferer(f_sched)
        out_f = f_inferer.sample(jnp.asarray(x_t), fn, scheduler=f_sched, eta=0.0)

        np.testing.assert_allclose(
            np.asarray(out_f), out_t.numpy(), rtol=1e-3, atol=1e-4,
            err_msg="DDIM-10 deterministic sample",
        )

    def test_train_forward_golden(self):
        ref_model, fn = _converted_pair(seed=2)
        rs = np.random.RandomState(7)
        x = rs.randn(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)
        ts = np.array([3, 9])

        t_sched = ref_sched.DDPMScheduler(num_train_timesteps=10)
        t_inferer = ref_inf.DiffusionInferer(t_sched)
        with torch.no_grad():
            pred_t = t_inferer(
                inputs=torch.from_numpy(x),
                diffusion_model=ref_model,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
            )

        f_sched = DDPMScheduler(num_train_timesteps=10)
        f_inferer = DiffusionInferer(f_sched)
        pred_f = f_inferer(
            jnp.asarray(x), fn, noise=jnp.asarray(noise), timesteps=jnp.asarray(ts)
        )
        np.testing.assert_allclose(
            np.asarray(pred_f), pred_t.numpy(), rtol=1e-4, atol=1e-4,
            err_msg="train forward",
        )
