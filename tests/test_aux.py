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

    def test_guided_dpmsolver(self, class_cond_model):
        # CFG composes with the stateful fast solver; at guidance_scale=1
        # the guided sampler must equal plain conditional DPM sampling
        from generativemodels_tpu.inferers import DiffusionInferer
        from generativemodels_tpu.networks.schedulers import DPMSolverMultistepScheduler

        scheduler = DPMSolverMultistepScheduler(num_train_timesteps=100)
        scheduler.set_timesteps(5)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
        cond = jnp.ones((2, 1, 4))
        img = sample_with_guidance(
            class_cond_model, scheduler, noise,
            conditioning=cond, unconditioning=jnp.zeros((2, 1, 4)),
            guidance_scale=3.0,
        )
        assert img.shape == noise.shape
        assert bool(jnp.isfinite(img).all())

        img_g1 = sample_with_guidance(
            class_cond_model, scheduler, noise,
            conditioning=cond, unconditioning=jnp.zeros((2, 1, 4)),
            guidance_scale=1.0,
        )
        plain = DiffusionInferer(scheduler).sample(
            noise, class_cond_model, conditioning=cond, mode="crossattn"
        )
        assert jnp.allclose(img_g1, plain, atol=1e-5)

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


class TestAnomalyRecipe:
    def test_encode_decode_roundtrip(self):
        from generativemodels_tpu.networks.schedulers import DDIMScheduler
        from generativemodels_tpu.recipes import anomaly_map

        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
        fn = lambda x, t: model.apply(variables, x, t)
        scheduler = DDIMScheduler(num_train_timesteps=100, clip_sample=False)
        scheduler.set_timesteps(10)
        image = jnp.ones((1, 1, 16, 16)) * 0.3
        recon, amap = anomaly_map(fn, scheduler, image, encode_steps=5)
        assert recon.shape == image.shape and amap.shape == image.shape
        # fresh (zero-output) model => reversible identity roundtrip
        np.testing.assert_allclose(np.asarray(amap), 0.0, atol=1e-4)


class TestSuperResolutionRecipe:
    def test_prepare_and_sample(self):
        from generativemodels_tpu.recipes import compute_scale_factor, prepare_sr_batch, sample_super_resolution

        low_res_scheduler = DDPMScheduler(num_train_timesteps=1000)
        low_res = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 8, 8))
        noised, levels = prepare_sr_batch(low_res, low_res_scheduler, jax.random.PRNGKey(1))
        assert noised.shape == low_res.shape and levels.shape == (2,)

        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=2, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
            num_class_embeds=1000,
        )
        x = jnp.zeros((2, 2, 16, 16))
        variables = model.init(jax.random.PRNGKey(2), x, jnp.array([0, 0]),
                               class_labels=jnp.array([0, 0]))
        fn = lambda x, t, labels: model.apply(variables, x, t, class_labels=labels)
        scheduler = DDPMScheduler(num_train_timesteps=1000)
        scheduler.set_timesteps(5)
        out = sample_super_resolution(fn, scheduler, low_res, upscale_factor=2,
                                      key=jax.random.PRNGKey(3))
        assert out.shape == (2, 1, 16, 16)

        z = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 8, 8)) * 2.5
        sf = compute_scale_factor(z)
        assert abs(float(1.0 / sf) - float(jnp.std(z))) < 1e-6


class TestNaNGuard:
    def test_skips_nonfinite_updates(self):
        from generativemodels_tpu.utils import guard_nans, init_guard

        def bad_step(state, x):
            # produces NaN loss when x is 0
            loss = 1.0 / x
            return state + 1, loss

        guarded = jax.jit(guard_nans(bad_step))
        g = init_guard(jnp.asarray(0.0))
        g, loss = guarded(g, jnp.asarray(2.0))
        assert float(g.inner) == 1.0 and int(g.skipped) == 0
        g, loss = guarded(g, jnp.asarray(0.0))
        assert float(g.inner) == 1.0  # update skipped
        assert int(g.skipped) == 1
        g, loss = guarded(g, jnp.asarray(4.0))
        assert float(g.inner) == 2.0 and int(g.skipped) == 1


class TestJitCheckpointRoundtrip:
    def test_restored_params_give_identical_outputs(self):
        """Framework analogue of the reference's TorchScript serialisation
        tests (tests/utils.py:720-744): jit + checkpoint round-trip must be
        numerically identical."""
        import tempfile

        from generativemodels_tpu.utils import CheckpointManager

        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(1), x, jnp.array([5]))
        fn = jax.jit(lambda v, x, t: model.apply(v, x, t))
        before = fn(variables, x, jnp.array([5]))

        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d)
            mgr.save(0, variables)
            restored = mgr.restore(template=variables)
            mgr.close()
        after = fn(restored, x, jnp.array([5]))
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


class TestDiffusionAutoencoder:
    def test_loss_and_reconstruct(self):
        from generativemodels_tpu.recipes import (
            SemanticEncoder, diffusion_autoencoder_loss, reconstruct,
        )

        unet = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8, with_conditioning=True, cross_attention_dim=16,
        )
        enc = SemanticEncoder(emb_dim=16, widths=(8, 8))
        images = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        u_vars = unet.init(jax.random.PRNGKey(1), jnp.zeros((2, 1, 16, 16)),
                           jnp.array([0, 0]), context=jnp.zeros((2, 1, 16)))
        e_vars = enc.init(jax.random.PRNGKey(2), images)
        unet_fn = lambda x, t, ctx: unet.apply(u_vars, x, t, context=ctx)
        enc_fn = lambda x: enc.apply(e_vars, x)

        scheduler = DDPMScheduler(num_train_timesteps=10)
        loss = diffusion_autoencoder_loss(unet_fn, enc_fn, scheduler, images,
                                          jax.random.PRNGKey(3), 10)
        assert bool(jnp.isfinite(loss))

        recon = reconstruct(unet_fn, enc_fn, scheduler, images, key=jax.random.PRNGKey(4))
        assert recon.shape == images.shape


class TestMetricsLogger:
    def test_jsonl_written(self):
        import json as json_mod
        import tempfile

        from generativemodels_tpu.utils import MetricsLogger

        with tempfile.TemporaryDirectory() as d:
            logger = MetricsLogger(d, use_tensorboard=False)
            logger.log(1, {"loss": jnp.asarray(0.5), "note": "x"})
            logger.log(2, {"loss": 0.25})
            logger.close()
            lines = [json_mod.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
        assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


class TestExport:
    def test_export_reload_roundtrip(self):
        import tempfile

        from generativemodels_tpu.utils import load_exported, save_exported

        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
        t = jnp.array([3])
        variables = model.init(jax.random.PRNGKey(1), x, t)
        fn = lambda x, t: model.apply(variables, x, t)
        expected = fn(x, t)

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "sampler.bin")
            save_exported(path, fn, x, t)
            served = load_exported(path)
            out = served(x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6)


class TestDownPathCache:
    def test_cached_down_matches_full_forward(self):
        """return_down / cached_down hooks: a cached forward at the SAME
        timestep is exact (the feature-caching contract)."""
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 16))
        t = jnp.array([5])
        variables = model.init(jax.random.PRNGKey(0), x, t)
        full, cache = model.apply(variables, x, t, return_down=True)
        cached = model.apply(variables, x, t, cached_down=cache)
        np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=1e-6)


class TestClassifierGuidance:
    def test_guided_sampling(self):
        from generativemodels_tpu.networks.nets import DiffusionModelEncoder
        from generativemodels_tpu.recipes import sample_with_classifier_guidance

        unet = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        clf = DiffusionModelEncoder(
            spatial_dims=2, in_channels=1, out_channels=3, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((2, 1, 16, 16))
        u_vars = unet.init(jax.random.PRNGKey(0), x, jnp.array([0, 0]))
        c_vars = clf.init(jax.random.PRNGKey(1), x, jnp.array([0, 0]))
        model_fn = lambda x, t: unet.apply(u_vars, x, t)
        clf_fn = lambda x, t: clf.apply(c_vars, x, t)

        scheduler = DDPMScheduler(num_train_timesteps=10)
        noise = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16))
        guided = sample_with_classifier_guidance(
            model_fn, clf_fn, scheduler, noise, jnp.array([1, 2]),
            guidance_scale=2.0, key=jax.random.PRNGKey(3),
        )
        assert guided.shape == noise.shape
        assert bool(jnp.isfinite(guided).all())
        # guidance changes the trajectory vs unguided
        unguided = sample_with_classifier_guidance(
            model_fn, clf_fn, scheduler, noise, jnp.array([1, 2]),
            guidance_scale=0.0, key=jax.random.PRNGKey(3),
        )
        assert not np.allclose(np.asarray(guided), np.asarray(unguided))


class TestBrainLDMSampler:
    def test_conditioned_brain_sampling(self):
        """Bundle-style conditioned sampling through the brain_3d_ldm wiring."""
        from generativemodels_tpu.networks.nets import AutoencoderKL
        from generativemodels_tpu.networks.schedulers import DDIMScheduler
        from generativemodels_tpu.recipes import make_conditioning, sample_brain_ldm

        aekl = AutoencoderKL(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(4, 4), attention_levels=(False, False), latent_channels=3,
            norm_num_groups=4, with_encoder_nonlocal_attn=False,
            with_decoder_nonlocal_attn=False,
        )
        x = jnp.zeros((1, 1, 16, 16, 16))
        a_vars = aekl.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x
        )
        bound = aekl.bind(a_vars, rngs={"sampling": jax.random.PRNGKey(2)})

        unet = DiffusionModelUNet(
            spatial_dims=3, in_channels=3, out_channels=3, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8, with_conditioning=True, cross_attention_dim=4,
        )
        z = jnp.zeros((1, 3, 8, 8, 8))
        u_vars = unet.init(jax.random.PRNGKey(3), z, jnp.array([0]),
                           context=jnp.zeros((1, 1, 4)))
        fn = lambda x, t, context=None, **kw: unet.apply(u_vars, x, t, context=context, **kw)

        cond = make_conditioning(1.0, 0.7, 0.3, 0.5)
        assert cond.shape == (1, 1, 4)
        scheduler = DDIMScheduler(num_train_timesteps=100)
        img = sample_brain_ldm(
            fn, bound, scheduler, latent_shape=(1, 3, 8, 8, 8),
            gender=1.0, age=0.7, num_inference_steps=5, key=jax.random.PRNGKey(4),
        )
        assert img.shape == (1, 1, 16, 16, 16)
        assert bool(jnp.isfinite(img).all())


class TestVQGANResume:
    """Checkpoint -> restore -> continue must equal uninterrupted training
    (exact resume, incl. the EMA codebook collection and both opt states)."""

    def test_exact_resume(self):
        import optax

        from generativemodels_tpu.networks.nets import PatchDiscriminator, VQVAE
        from generativemodels_tpu.recipes import VQGANState, make_vqgan_step

        vqvae = VQVAE(
            spatial_dims=2, in_channels=1, out_channels=1,
            num_channels=(8, 8), num_res_layers=1, num_res_channels=(8, 8),
            downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
            upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
            num_embeddings=16, embedding_dim=4,
        )
        disc = PatchDiscriminator(spatial_dims=2, num_channels=4, in_channels=1,
                                  num_layers_d=2, norm="INSTANCE")
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 32, 32))
        g_vars = vqvae.init(jax.random.PRNGKey(1), x, train=False)
        d_vars = disc.init(jax.random.PRNGKey(2), x)
        g_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
        state0 = VQGANState(
            g_params=g_vars["params"], codebook=g_vars["codebook"],
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_opt_state=d_tx.init(d_vars["params"]),
            step=jnp.asarray(0),
        )
        step = make_vqgan_step(vqvae, disc, g_tx, d_tx, adv_weight=0.01)
        batches = [jax.random.uniform(jax.random.PRNGKey(10 + i), (2, 1, 32, 32))
                   for i in range(3)]

        # uninterrupted: 3 steps
        s = state0
        for b in batches:
            s, _ = step(s, b)
        uninterrupted = s

        # interrupted: 2 steps -> checkpoint -> restore -> 1 step
        s = state0
        for b in batches[:2]:
            s, _ = step(s, b)
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, max_to_keep=1)
            assert mgr.save(int(s.step), s, force=True)
            restored = mgr.restore(template=s)
            mgr.close()
        resumed, _ = step(restored, batches[2])

        for a, b in zip(jax.tree_util.tree_leaves(uninterrupted),
                        jax.tree_util.tree_leaves(resumed)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLegacyConvMigration:
    def test_strips_conv0_level(self):
        import numpy as np

        from generativemodels_tpu.utils.checkpoint import migrate_legacy_conv_params

        k = np.ones((3, 3, 4, 8), np.float32)
        b = np.zeros((8,), np.float32)
        old = {
            "params": {
                "conv_in": {"Conv_0": {"kernel": k, "bias": b}},
                "up": {"tconv": {"ConvTranspose_0": {"kernel": k}}},
                "norm": {"scale": b},  # untouched
            }
        }
        new = migrate_legacy_conv_params(old)
        assert new["params"]["conv_in"]["kernel"] is k
        assert new["params"]["conv_in"]["bias"] is b
        assert new["params"]["up"]["tconv"]["kernel"] is k
        assert new["params"]["norm"]["scale"] is b

    def test_leaves_modern_trees_alone(self):
        import numpy as np

        from generativemodels_tpu.utils.checkpoint import migrate_legacy_conv_params

        modern = {"conv": {"kernel": np.ones((3, 3, 1, 1)), "bias": np.zeros(1)}}
        assert migrate_legacy_conv_params(modern) == modern
