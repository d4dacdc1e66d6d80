"""Engine tests: fused adversarial step + integration-style training run.

Mirrors the reference integration test strategy
(tests/test_integration_workflows_adversarial.py:141-167: AEKL + PatchGAN
adversarial run over synthetic data asserting counters and progress).
"""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from generativemodels_tpu.engines import (
    AdversarialTrainer,
    AdversarialTrainState,
    DiffusionPrepareBatch,
    VPredictionPrepareBatch,
    make_adversarial_train_step,
)
from generativemodels_tpu.losses import PatchAdversarialLoss
from generativemodels_tpu.networks.nets import AutoencoderKL, PatchDiscriminator
from generativemodels_tpu.networks.schedulers import DDPMScheduler
from generativemodels_tpu.utils import AdversarialKeys


def _build_models():
    g = AutoencoderKL(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(4, 4), attention_levels=(False, False), latent_channels=1,
        norm_num_groups=4, with_encoder_nonlocal_attn=False,
        with_decoder_nonlocal_attn=False,
    )
    d = PatchDiscriminator(
        spatial_dims=2, num_channels=4, in_channels=1, num_layers_d=2, norm="INSTANCE",
    )
    x = jnp.zeros((2, 1, 16, 16))
    g_vars = g.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
    d_vars = d.init(jax.random.PRNGKey(2), x)

    def g_forward(params, model_state, inputs, rng):
        recon, _, _ = g.apply({"params": params}, inputs, rngs={"sampling": rng})
        return recon, model_state

    def d_forward(params, model_state, images):
        outs = d.apply({"params": params}, images)
        return outs[-1], model_state

    return g, d, g_vars, d_vars, g_forward, d_forward


class TestFusedAdversarialStep:
    def test_single_step_updates_both(self):
        g, d, g_vars, d_vars, g_forward, d_forward = _build_models()
        adv = PatchAdversarialLoss(criterion="least_squares")
        g_tx, d_tx = optax.adam(1e-4), optax.adam(1e-4)
        state = AdversarialTrainState(
            g_params=g_vars["params"], g_model_state={},
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_model_state={},
            d_opt_state=d_tx.init(d_vars["params"]),
            step=jnp.asarray(0),
        )
        step = make_adversarial_train_step(
            g_forward, d_forward, g_tx, d_tx,
            recon_loss_fn=lambda fakes, targets: jnp.mean(jnp.abs(fakes - targets)),
            g_loss_fn=lambda logits: PatchAdversarialLoss(criterion="least_squares")(
                logits, target_is_real=True, for_discriminator=False),
            d_loss_fn=lambda real, fake: 0.5 * (
                adv(real, target_is_real=True, for_discriminator=True)
                + adv(fake, target_is_real=False, for_discriminator=True)),
            donate=False,
        )
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 1, 16, 16))
        new_state, out = step(state, x, x, jax.random.PRNGKey(4))
        assert int(new_state.step) == 1
        g_changed = jax.tree_util.tree_map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
            state.g_params, new_state.g_params)
        assert any(jax.tree_util.tree_leaves(g_changed))
        for k in (AdversarialKeys.RECONSTRUCTION_LOSS, AdversarialKeys.GENERATOR_LOSS,
                  AdversarialKeys.DISCRIMINATOR_LOSS):
            assert bool(jnp.isfinite(out[k]))


class TestAdversarialTrainerIntegration:
    def test_five_epoch_run(self):
        """Adversarial AEKL+PatchGAN run over 40 synthetic images, 5 epochs."""
        g, d, g_vars, d_vars, g_forward, d_forward = _build_models()
        adv = PatchAdversarialLoss(criterion="least_squares")
        g_tx, d_tx = optax.adam(5e-4), optax.adam(5e-4)
        state = AdversarialTrainState(
            g_params=g_vars["params"], g_model_state={},
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_model_state={},
            d_opt_state=d_tx.init(d_vars["params"]),
            step=jnp.asarray(0),
        )
        rng = np.random.RandomState(0)
        data = [jnp.asarray(rng.rand(4, 1, 16, 16).astype(np.float32)) for _ in range(10)]

        events_fired = []
        recon_losses = []
        trainer = AdversarialTrainer(
            train_data_loader=data,
            max_epochs=5,
            g_forward=g_forward,
            d_forward=d_forward,
            g_tx=g_tx,
            d_tx=d_tx,
            recon_loss_function=lambda f, t: jnp.mean(jnp.abs(f - t)),
            g_loss_function=lambda logits: adv(logits, True, False),
            d_loss_function=lambda real, fake: 0.5 * (
                adv(real, True, True) + adv(fake, False, True)),
            initial_state=state,
            adv_weight=0.01,
            handlers={
                "iteration_completed": lambda tr, out: recon_losses.append(
                    float(out[AdversarialKeys.RECONSTRUCTION_LOSS])),
                "epoch_completed": lambda tr, out: events_fired.append(tr.epoch),
            },
        )
        final = trainer.run()
        assert trainer.iteration == 50
        assert trainer.epoch == 5
        assert events_fired == [1, 2, 3, 4, 5]
        assert int(final.step) == 50
        # reconstruction should improve
        assert np.mean(recon_losses[-10:]) < np.mean(recon_losses[:10])


class TestPrepareBatch:
    def test_diffusion_prepare_batch(self):
        pb = DiffusionPrepareBatch(num_train_timesteps=100)
        images = jnp.zeros((4, 1, 8, 8))
        imgs, target, kwargs = pb(images, jax.random.PRNGKey(0))
        assert imgs.shape == images.shape
        assert target.shape == images.shape  # noise target
        assert kwargs["timesteps"].shape == (4,)
        assert int(kwargs["timesteps"].max()) < 100

    def test_conditioned_dict_batch(self):
        pb = DiffusionPrepareBatch(num_train_timesteps=10, condition_name="cond")
        batch = {"image": jnp.zeros((2, 1, 8, 8)), "cond": jnp.ones((2, 3))}
        _, _, kwargs = pb(batch, jax.random.PRNGKey(0))
        assert "conditioning" in kwargs

    def test_v_prediction_target(self):
        sched = DDPMScheduler(num_train_timesteps=100)
        pb = VPredictionPrepareBatch(sched, num_train_timesteps=100)
        images = jnp.ones((2, 1, 8, 8))
        _, target, kwargs = pb(images, jax.random.PRNGKey(0))
        expected = sched.get_velocity(images, kwargs["noise"], kwargs["timesteps"])
        np.testing.assert_allclose(np.asarray(target), np.asarray(expected))


class TestBatchNormDiscriminatorState:
    def test_batch_stats_update_through_fused_step(self):
        """BATCH-norm discriminators carry batch_stats through the fused
        step (the reference instead warns to convert to SyncBN, 
        patchgan_discriminator.py:262-267)."""
        from generativemodels_tpu.networks.nets import PatchDiscriminator

        g, d_unused, g_vars, _, g_forward, _ = _build_models()
        d = PatchDiscriminator(
            spatial_dims=2, num_channels=4, in_channels=1, num_layers_d=2, norm="BATCH",
        )
        x = jnp.zeros((2, 1, 16, 16))
        d_vars = d.init(jax.random.PRNGKey(9), x)

        def d_forward(params, model_state, images):
            outs, mutated = d.apply(
                {"params": params, "batch_stats": model_state}, images,
                deterministic=False, mutable=["batch_stats"],
            )
            return outs[-1], mutated["batch_stats"]

        adv = PatchAdversarialLoss(criterion="least_squares")
        g_tx, d_tx = optax.adam(1e-4), optax.adam(1e-4)
        state = AdversarialTrainState(
            g_params=g_vars["params"], g_model_state={},
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_model_state=d_vars["batch_stats"],
            d_opt_state=d_tx.init(d_vars["params"]),
            step=jnp.asarray(0),
        )
        step = make_adversarial_train_step(
            g_forward, d_forward, g_tx, d_tx,
            recon_loss_fn=lambda f, t: jnp.mean(jnp.abs(f - t)),
            g_loss_fn=lambda l: adv(l, True, False),
            d_loss_fn=lambda r, f: 0.5 * (adv(r, True, True) + adv(f, False, True)),
            donate=False,
        )
        xin = jax.random.uniform(jax.random.PRNGKey(3), (2, 1, 16, 16))
        new_state, out = step(state, xin, xin, jax.random.PRNGKey(4))
        before = jax.tree_util.tree_leaves(state.d_model_state)[0]
        after = jax.tree_util.tree_leaves(new_state.d_model_state)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestVQGANStep:
    def test_fused_step_updates_g_d_and_codebook(self):
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
        state = VQGANState(
            g_params=g_vars["params"], codebook=g_vars["codebook"],
            g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_opt_state=d_tx.init(d_vars["params"]),
            step=jnp.asarray(0),
        )
        step = make_vqgan_step(vqvae, disc, g_tx, d_tx, adv_weight=0.01)
        new_state, out = step(state, x)

        assert int(new_state.step) == 1
        for key in ("reconstruction_loss", "quantization_loss",
                    "generator_loss", "feature_matching_loss", "d_total"):
            assert jnp.isfinite(out[key])
        # G params, D params and the EMA codebook must all have moved
        g_moved = jax.tree_util.tree_map(
            lambda a, b: bool((a != b).any()), state.g_params, new_state.g_params)
        assert any(jax.tree_util.tree_leaves(g_moved))
        d_moved = jax.tree_util.tree_map(
            lambda a, b: bool((a != b).any()), state.d_params, new_state.d_params)
        assert any(jax.tree_util.tree_leaves(d_moved))
        cb_moved = jax.tree_util.tree_map(
            lambda a, b: bool((a != b).any()), state.codebook, new_state.codebook)
        assert any(jax.tree_util.tree_leaves(cb_moved))


class TestGeneratorEMA:
    """ema_decay on the fused G+D step maintains an EMA of g_params
    (beyond reference — standard VQ-GAN deployment practice)."""

    def test_g_ema_tracks_and_lags(self):
        import optax
        from generativemodels_tpu.engines.trainer import (
            AdversarialTrainState,
            make_adversarial_train_step,
        )

        g_fwd = lambda p, ms, x, rng: (x * p["w"], ms)
        d_fwd = lambda p, ms, x: (x * p["w"], ms)
        g_tx, d_tx = optax.adam(1e-2), optax.adam(1e-2)
        g_params = {"w": jnp.ones(())}
        d_params = {"w": jnp.ones(())}
        step = make_adversarial_train_step(
            g_fwd, d_fwd, g_tx, d_tx,
            recon_loss_fn=lambda f, t: jnp.mean((f - t) ** 2),
            g_loss_fn=lambda lg: -jnp.mean(lg),
            d_loss_fn=lambda rl, fl: jnp.mean(fl) - jnp.mean(rl),
            donate=False, ema_decay=0.9,
        )
        state = AdversarialTrainState(
            g_params=g_params, g_model_state={}, g_opt_state=g_tx.init(g_params),
            d_params=d_params, d_model_state={}, d_opt_state=d_tx.init(d_params),
            step=jnp.asarray(0),
            g_ema_params=jax.tree_util.tree_map(jnp.array, g_params),
        )
        x = jnp.ones((4, 3))
        expected = g_params["w"]
        for s in range(3):
            state, out = step(state, x, x, jax.random.PRNGKey(s))
            d = min(0.9, (1.0 + s) / (10.0 + s))
            expected = expected * d + state.g_params["w"] * (1 - d)
        np.testing.assert_allclose(
            np.asarray(state.g_ema_params["w"]), np.asarray(expected), rtol=1e-6
        )
        assert float(jnp.abs(state.g_ema_params["w"] - state.g_params["w"])) > 0

    def test_default_keeps_none(self):
        import optax
        from generativemodels_tpu.engines.trainer import (
            AdversarialTrainState,
            make_adversarial_train_step,
        )

        g_tx, d_tx = optax.sgd(1e-2), optax.sgd(1e-2)
        g_params = {"w": jnp.ones(())}
        step = make_adversarial_train_step(
            (lambda p, ms, x, rng: (x * p["w"], ms)),
            (lambda p, ms, x: (x * p["w"], ms)),
            g_tx, d_tx,
            recon_loss_fn=lambda f, t: jnp.mean((f - t) ** 2),
            g_loss_fn=lambda lg: -jnp.mean(lg),
            d_loss_fn=lambda rl, fl: jnp.mean(fl) - jnp.mean(rl),
            donate=False,
        )
        state = AdversarialTrainState(
            g_params=g_params, g_model_state={}, g_opt_state=g_tx.init(g_params),
            d_params=g_params, d_model_state={}, d_opt_state=d_tx.init(g_params),
            step=jnp.asarray(0),
        )
        x = jnp.ones((2, 2))
        state, _ = step(state, x, x, jax.random.PRNGKey(0))
        assert state.g_ema_params is None
