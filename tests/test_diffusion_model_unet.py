"""DiffusionModelUNet shape/contract tests.

Mirrors the reference parameterised grids (tests/test_diffusion_model_unet.py:
23-120): {2D,3D} x {attention} x {conditioning} x {resblock_updown}, output
shape checks, and invalid-config error raising.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.networks.nets import DiffusionModelEncoder, DiffusionModelUNet

UNCOND_CASES_2D = [
    dict(num_res_blocks=1, num_channels=(8, 8, 8), attention_levels=(False, False, False),
         norm_num_groups=8),
    dict(num_res_blocks=(1, 1, 2), num_channels=(8, 8, 8),
         attention_levels=(False, False, False), norm_num_groups=8),
    dict(num_res_blocks=1, num_channels=(8, 8, 8), attention_levels=(False, False, False),
         norm_num_groups=8, resblock_updown=True),
    dict(num_res_blocks=1, num_channels=(8, 8, 8), attention_levels=(False, False, True),
         num_head_channels=8, norm_num_groups=8),
    dict(num_res_blocks=1, num_channels=(8, 8, 8), attention_levels=(False, False, True),
         num_head_channels=8, norm_num_groups=8, resblock_updown=True),
    dict(num_res_blocks=1, num_channels=(8, 8, 8), attention_levels=(False, False, True),
         num_head_channels=4, norm_num_groups=8),
    dict(num_res_blocks=1, num_channels=(8, 8, 8), attention_levels=(False, True, True),
         num_head_channels=(0, 2, 4), norm_num_groups=8),
]


def _init_and_apply(model, x, t, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), x, t, **kwargs)
    return model.apply(variables, x, t, **kwargs)


class TestDiffusionModelUNet2D:
    @pytest.mark.parametrize("params", UNCOND_CASES_2D)
    def test_shape_unconditioned(self, params):
        model = DiffusionModelUNet(spatial_dims=2, in_channels=1, out_channels=1, **params)
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        out = _init_and_apply(model, x, t)
        assert out.shape == (1, 1, 16, 16)

    def test_timestep_broadcast(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8, 8), attention_levels=(False, False, False), norm_num_groups=8,
        )
        x = jnp.zeros((3, 1, 16, 16))
        t = jnp.array([4, 10, 500])
        out = _init_and_apply(model, x, t)
        assert out.shape == (3, 1, 16, 16)

    def test_with_conditioning(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8, 8), attention_levels=(False, False, True),
            with_conditioning=True, transformer_num_layers=1, cross_attention_dim=3,
            norm_num_groups=8, num_head_channels=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        ctx = jnp.zeros((1, 1, 3))
        out = _init_and_apply(model, x, t, context=ctx)
        assert out.shape == (1, 1, 16, 16)

    def test_class_conditioning(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8, 8), attention_levels=(False, False, False),
            norm_num_groups=8, num_class_embeds=3,
        )
        x = jnp.zeros((2, 1, 16, 16))
        t = jnp.array([0, 1])
        labels = jnp.array([0, 2])
        out = _init_and_apply(model, x, t, class_labels=labels)
        assert out.shape == (2, 1, 16, 16)

    def test_fresh_model_outputs_zero(self):
        """Zero-init output conv => a fresh model returns exactly zero."""
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 16, 16).astype(np.float32))
        out = _init_and_apply(model, x, jnp.array([5]))
        assert np.allclose(np.asarray(out), 0.0)

    def test_error_conditioning_mismatch(self):
        with pytest.raises(ValueError):
            model = DiffusionModelUNet(
                spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
                num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
                with_conditioning=True,
            )
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16)), jnp.array([0]))

    def test_error_channels_not_multiple_of_groups(self):
        with pytest.raises(ValueError):
            model = DiffusionModelUNet(
                spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
                num_channels=(8, 12), attention_levels=(False, False), norm_num_groups=8,
            )
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16)), jnp.array([0]))

    def test_error_attention_levels_mismatch(self):
        with pytest.raises(ValueError):
            model = DiffusionModelUNet(
                spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
                num_channels=(8, 8), attention_levels=(False, False, True), norm_num_groups=8,
            )
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16)), jnp.array([0]))


class TestDiffusionModelUNet3D:
    def test_shape_unconditioned(self):
        model = DiffusionModelUNet(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8, 8), attention_levels=(False, False, True),
            norm_num_groups=4, num_head_channels=4,
        )
        x = jnp.zeros((1, 1, 16, 16, 16))
        t = jnp.array([0])
        out = _init_and_apply(model, x, t)
        assert out.shape == (1, 1, 16, 16, 16)

    def test_shape_conditioned(self):
        model = DiffusionModelUNet(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8, 8), attention_levels=(False, False, True),
            with_conditioning=True, transformer_num_layers=1, cross_attention_dim=4,
            norm_num_groups=8, num_head_channels=8,
        )
        x = jnp.zeros((1, 1, 16, 16, 16))
        out = _init_and_apply(model, x, jnp.array([0]), context=jnp.zeros((1, 1, 4)))
        assert out.shape == (1, 1, 16, 16, 16)


class TestControlNetHooks:
    def test_additional_residuals(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        variables = model.init(jax.random.PRNGKey(0), x, t)
        # down path emits: conv_in, level0 res, level0 down, level1 res => 4 skips
        residuals = [
            jnp.ones((1, 8, 16, 16)),
            jnp.ones((1, 8, 16, 16)),
            jnp.ones((1, 8, 8, 8)),
            jnp.ones((1, 8, 8, 8)),
        ]
        mid_res = jnp.ones((1, 8, 8, 8))
        out = model.apply(
            variables, x, t,
            down_block_additional_residuals=residuals,
            mid_block_additional_residual=mid_res,
        )
        assert out.shape == (1, 1, 16, 16)


class TestDiffusionModelEncoder:
    def test_shape(self):
        model = DiffusionModelEncoder(
            spatial_dims=2, in_channels=1, out_channels=2, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((2, 1, 16, 16))
        out = _init_and_apply(model, x, jnp.array([0, 1]))
        assert out.shape == (2, 2)


class TestLearnedVarianceOutput:
    def test_channel_doubled_output_with_ddpm_step(self):
        """Learned-range variance: UNet predicts 2C channels; the scheduler
        splits them (reference ddpm.py:207-210)."""
        from generativemodels_tpu.networks.schedulers import DDPMScheduler

        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=2, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
        out = model.apply(variables, x, jnp.array([10]))
        assert out.shape == (1, 2, 16, 16)
        scheduler = DDPMScheduler(num_train_timesteps=100, variance_type="learned_range")
        prev, x0 = scheduler.step(out, 10, x, key=jax.random.PRNGKey(1))
        assert prev.shape == x.shape


class TestResblockUpdown3D:
    def test_3d_resblock_updown(self):
        model = DiffusionModelUNet(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
            resblock_updown=True,
        )
        x = jnp.zeros((1, 1, 16, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
        out = model.apply(variables, x, jnp.array([0]))
        assert out.shape == (1, 1, 16, 16, 16)


class TestCheckpointedUNet:
    def test_remat_matches_no_remat(self):
        kwargs = dict(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        plain = DiffusionModelUNet(**kwargs)
        remat = DiffusionModelUNet(use_checkpointing=True, **kwargs)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 16, 16).astype(np.float32))
        t = jnp.array([7])
        variables = plain.init(jax.random.PRNGKey(0), x, t)
        a = plain.apply(variables, x, t)
        b = remat.apply(variables, x, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        # gradients must also agree
        ga = jax.grad(lambda v: jnp.sum(plain.apply(v, x, t) ** 2))(variables)
        gb = jax.grad(lambda v: jnp.sum(remat.apply(v, x, t) ** 2))(variables)
        la = jax.tree_util.tree_leaves(ga)[0]
        lb = jax.tree_util.tree_leaves(gb)[0]
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-6)

    def test_per_level_remat_matches_and_validates(self):
        """use_checkpointing accepts a per-level sequence (round-4: exempt
        the attention level from remat; benchmarks/results_3d_remat.json);
        outputs and grads match the bool paths, wrong length raises."""
        kwargs = dict(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True),
            norm_num_groups=8, num_head_channels=8,
        )
        plain = DiffusionModelUNet(**kwargs)
        part = DiffusionModelUNet(use_checkpointing=(True, False), **kwargs)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 1, 16, 16).astype(np.float32))
        t = jnp.array([3, 11])
        variables = plain.init(jax.random.PRNGKey(0), x, t)
        np.testing.assert_allclose(
            np.asarray(part.apply(variables, x, t)),
            np.asarray(plain.apply(variables, x, t)), rtol=1e-5, atol=1e-6,
        )
        ga = jax.grad(lambda v: jnp.sum(plain.apply(v, x, t) ** 2))(variables)
        gb = jax.grad(lambda v: jnp.sum(part.apply(v, x, t) ** 2))(variables)
        for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-6)
        bad = DiffusionModelUNet(use_checkpointing=(True,), **kwargs)
        with pytest.raises(ValueError, match="one entry per level"):
            bad.init(jax.random.PRNGKey(0), x, t)
