"""Tests for auxiliary subsystems: checkpointing, profiling, recipes."""
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDIMScheduler, DDPMScheduler
from generativemodels_tpu.recipes import drop_condition, inpaint, sample_with_guidance
from generativemodels_tpu.utils import CheckpointManager, StepTimer


class TestCheckpoint:
    def test_save_restore_roundtrip(self):
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "opt": {"mu": jnp.ones((2, 3))},
            "step": jnp.asarray(7),
        }
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, max_to_keep=2)
            assert mgr.save(0, state)
            restored = mgr.restore(template=state)
            np.testing.assert_allclose(
                np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
            )
            assert int(restored["step"]) == 7
            mgr.close()

    def test_retention(self):
        state = {"x": jnp.zeros(2)}
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, max_to_keep=2)
            for i in range(4):
                mgr.save(i, state)
            assert mgr.latest_step() == 3
            assert len(mgr.all_steps()) <= 2
            mgr.close()

    def test_missing_raises(self):
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d)
            with pytest.raises(FileNotFoundError):
                mgr.restore()
            mgr.close()


class TestRecipes:
    @pytest.fixture(scope="class")
    def class_cond_model(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8, with_conditioning=True, cross_attention_dim=4,
        )
        x = jnp.zeros((2, 1, 16, 16))
        variables = model.init(
            jax.random.PRNGKey(0), x, jnp.array([0, 0]), context=jnp.zeros((2, 1, 4))
        )
        return lambda x, t, context: model.apply(variables, x, t, context=context)

    def test_drop_condition(self):
        cond = jnp.ones((100, 1, 4))
        dropped = drop_condition(cond, uncond_value=-1.0, prob=0.5, key=jax.random.PRNGKey(0))
        frac = float((dropped[:, 0, 0] == -1.0).mean())
        assert 0.3 < frac < 0.7

    def test_guided_sampling(self, class_cond_model):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
        img = sample_with_guidance(
            class_cond_model, scheduler, noise,
            conditioning=jnp.ones((2, 1, 4)), unconditioning=jnp.zeros((2, 1, 4)),
            guidance_scale=3.0, key=jax.random.PRNGKey(1),
        )
        assert img.shape == noise.shape
        assert bool(jnp.isfinite(img).all())

    def test_guided_ddim(self, class_cond_model):
        scheduler = DDIMScheduler(num_train_timesteps=10)
        scheduler.set_timesteps(10)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
        img = sample_with_guidance(
            class_cond_model, scheduler, noise,
            conditioning=jnp.ones((2, 1, 4)), unconditioning=jnp.zeros((2, 1, 4)),
        )
        assert bool(jnp.isfinite(img).all())

    def test_inpaint_preserves_known_region_structure(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
        fn = lambda x, t: model.apply(variables, x, t)
        scheduler = DDPMScheduler(num_train_timesteps=10)
        image = jnp.ones((1, 1, 16, 16)) * 0.5
        mask = jnp.zeros((1, 1, 16, 16)).at[:, :, 4:12, 4:12].set(1.0)
        result = inpaint(fn, scheduler, image, mask, key=jax.random.PRNGKey(1),
                         num_resample_steps=2)
        assert result.shape == image.shape
        assert bool(jnp.isfinite(result).all())


class TestStepTimer:
    def test_steps_per_sec(self):
        timer = StepTimer(warmup=1)
        for _ in range(5):
            timer.tick()
        assert timer.steps_per_sec is not None and timer.steps_per_sec > 0
