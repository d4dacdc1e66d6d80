"""Tests for stage-1 models: AutoencoderKL, VQVAE, PatchGAN, losses.

Mirrors reference tests/test_autoencoderkl.py, test_vqvae.py,
test_vector_quantizer.py, test_patch_gan.py, test_adversarial_loss.py,
test_spectral_loss.py (shape/contract grids on CPU).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.losses import JukeboxLoss, PatchAdversarialLoss
from generativemodels_tpu.networks.layers import EMAQuantizer
from generativemodels_tpu.networks.nets import (
    AutoencoderKL,
    MultiScalePatchDiscriminator,
    PatchDiscriminator,
    VQVAE,
)


class TestAutoencoderKL:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(num_res_blocks=1, num_channels=(4, 4, 4), attention_levels=(False, False, False),
                 latent_channels=1, norm_num_groups=4),
            dict(num_res_blocks=(1, 1, 2), num_channels=(4, 4, 4),
                 attention_levels=(False, False, True), latent_channels=1, norm_num_groups=4),
            dict(num_res_blocks=1, num_channels=(4, 4, 4), attention_levels=(False, False, False),
                 latent_channels=1, norm_num_groups=4, use_convtranspose=True),
        ],
    )
    def test_shape_2d(self, kwargs):
        model = AutoencoderKL(spatial_dims=2, in_channels=1, out_channels=1,
                              with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
                              **kwargs)
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
        recon, z_mu, z_sigma = model.apply(variables, x, rngs={"sampling": jax.random.PRNGKey(2)})
        assert recon.shape == (1, 1, 16, 16)
        assert z_mu.shape == (1, 1, 4, 4)
        assert z_sigma.shape == (1, 1, 4, 4)

    def test_shape_3d(self):
        model = AutoencoderKL(spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
                              num_channels=(4, 4), attention_levels=(False, False),
                              latent_channels=1, norm_num_groups=4,
                              with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False)
        x = jnp.zeros((1, 1, 8, 8, 8))
        variables = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
        recon, z_mu, z_sigma = model.apply(variables, x, rngs={"sampling": jax.random.PRNGKey(2)})
        assert recon.shape == (1, 1, 8, 8, 8)
        assert z_mu.shape == (1, 1, 4, 4, 4)

    def test_nonlocal_attn(self):
        model = AutoencoderKL(spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
                              num_channels=(4, 4), attention_levels=(False, False),
                              latent_channels=1, norm_num_groups=4)
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
        recon, _, _ = model.apply(variables, x, rngs={"sampling": jax.random.PRNGKey(2)})
        assert recon.shape == (1, 1, 16, 16)

    def test_stage2_api(self):
        model = AutoencoderKL(spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
                              num_channels=(4, 4), attention_levels=(False, False),
                              latent_channels=2, norm_num_groups=4,
                              with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False)
        x = jnp.zeros((2, 1, 16, 16))
        variables = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
        z = model.apply(variables, x, method="encode_stage_2_inputs",
                        rngs={"sampling": jax.random.PRNGKey(2)})
        assert z.shape == (2, 2, 8, 8)
        img = model.apply(variables, z, method="decode_stage_2_outputs")
        assert img.shape == (2, 1, 16, 16)
        recon = model.apply(variables, x, method="reconstruct")
        assert recon.shape == x.shape

    def test_invalid_channels(self):
        with pytest.raises(ValueError):
            model = AutoencoderKL(spatial_dims=2, in_channels=1, out_channels=1,
                                  num_channels=(4, 6), attention_levels=(False, False),
                                  norm_num_groups=4)
            model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                       jnp.zeros((1, 1, 16, 16)))


class TestEMAQuantizer:
    def test_quantize_roundtrip(self):
        q = EMAQuantizer(spatial_dims=2, num_embeddings=16, embedding_dim=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        variables = q.init(jax.random.PRNGKey(1), x)
        (quantized, loss, indices), _ = q.apply(
            variables, x, train=False, mutable=["codebook"]
        )
        assert quantized.shape == x.shape
        assert indices.shape == (2, 8, 8)
        assert float(loss) >= 0

    def test_ema_updates_codebook(self):
        q = EMAQuantizer(spatial_dims=2, num_embeddings=8, embedding_dim=4, decay=0.5)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        variables = q.init(jax.random.PRNGKey(1), x)
        before = variables["codebook"]["embedding"]
        (_, _, _), mutated = q.apply(variables, x, train=True, mutable=["codebook"])
        after = mutated["codebook"]["embedding"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_straight_through_gradient(self):
        q = EMAQuantizer(spatial_dims=2, num_embeddings=8, embedding_dim=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
        variables = q.init(jax.random.PRNGKey(1), x)

        def f(x):
            (quantized, _, _), _ = q.apply(variables, x, train=False, mutable=["codebook"])
            return jnp.sum(quantized)

        g = jax.grad(f)(x)
        # straight-through: dL/dx == 1 everywhere
        np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-5)


class TestVQVAE:
    def _make(self, **kw):
        cfg = dict(
            spatial_dims=2, in_channels=1, out_channels=1, num_channels=(4, 4),
            num_res_layers=1, num_res_channels=(4, 4),
            downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
            upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
            num_embeddings=8, embedding_dim=4,
        )
        cfg.update(kw)
        return VQVAE(**cfg)

    def test_forward_shape(self):
        model = self._make()
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x)
        (recon, qloss), _ = model.apply(variables, x, train=False,
                                        mutable=["codebook", "metrics"])
        assert recon.shape == (1, 1, 16, 16)
        assert qloss.shape == ()

    def test_3d_forward(self):
        model = self._make(spatial_dims=3)
        x = jnp.zeros((1, 1, 8, 8, 8))
        variables = model.init(jax.random.PRNGKey(0), x)
        (recon, _), _ = model.apply(variables, x, mutable=["codebook", "metrics"])
        assert recon.shape == (1, 1, 8, 8, 8)

    def test_index_quantize_and_decode_samples(self):
        model = self._make()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(1), x)
        indices, _ = model.apply(variables, x, method="index_quantize",
                                 mutable=["codebook", "metrics"])
        assert indices.shape == (1, 4, 4)
        assert int(indices.max()) < 8
        img = model.apply(variables, indices, method="decode_samples")
        assert img.shape == (1, 1, 16, 16)

    def test_training_updates_codebook(self):
        model = self._make()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(1), x)
        (recon, _), mutated = model.apply(variables, x, train=True,
                                          mutable=["codebook", "metrics"])
        before = variables["codebook"]["quantizer"]["quantizer"]["embedding"] \
            if "quantizer" in variables["codebook"] else None
        assert "metrics" in mutated  # perplexity tracked

    def test_stage2_api(self):
        model = self._make()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(1), x)
        z, _ = model.apply(variables, x, method="encode_stage_2_inputs",
                           mutable=["codebook", "metrics"])
        assert z.shape == (1, 4, 4, 4)
        img, _ = model.apply(variables, z, method="decode_stage_2_outputs",
                             mutable=["codebook", "metrics"])
        assert img.shape == (1, 1, 16, 16)


class TestPatchDiscriminator:
    def test_output_structure(self):
        d = PatchDiscriminator(spatial_dims=2, num_channels=4, in_channels=1,
                               num_layers_d=2, norm="INSTANCE")
        x = jnp.zeros((2, 1, 32, 32))
        variables = d.init(jax.random.PRNGKey(0), x)
        outs = d.apply(variables, x)
        # initial + 2 layers + final = 4 tensors, output last
        assert len(outs) == 4
        assert outs[-1].shape[0] == 2 and outs[-1].shape[1] == 1

    def test_batchnorm_variant(self):
        d = PatchDiscriminator(spatial_dims=2, num_channels=4, in_channels=1,
                               num_layers_d=2, norm="BATCH")
        x = jnp.zeros((2, 1, 32, 32))
        variables = d.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in variables
        outs, mutated = d.apply(variables, x, deterministic=False, mutable=["batch_stats"])
        assert len(outs) == 4

    def test_multiscale(self):
        d = MultiScalePatchDiscriminator(
            num_d=2, num_layers_d=2, spatial_dims=2, num_channels=4, in_channels=1,
            pooling_method="avg", norm="INSTANCE", minimum_size_im=32,
        )
        x = jnp.zeros((2, 1, 32, 32))
        variables = d.init(jax.random.PRNGKey(0), x)
        outputs, features = d.apply(variables, x)
        assert len(outputs) == 2 and len(features) == 2
        assert len(features[0]) == 3  # initial + 2 layers


class TestLosses:
    @pytest.mark.parametrize("criterion", ["bce", "hinge", "least_squares"])
    def test_adversarial_scalar(self, criterion):
        loss_fn = PatchAdversarialLoss(criterion=criterion)
        logits = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 8, 8))
        for target_is_real in (True, False):
            loss = loss_fn(logits, target_is_real=target_is_real, for_discriminator=True)
            assert loss.shape == ()
            assert bool(jnp.isfinite(loss))

    def test_adversarial_multiscale_list(self):
        loss_fn = PatchAdversarialLoss(criterion="least_squares", reduction="none")
        logits = [jnp.ones((2, 1, 8, 8)), jnp.zeros((2, 1, 4, 4))]
        losses = loss_fn(logits, target_is_real=True, for_discriminator=True)
        assert len(losses) == 2

    def test_generator_mode_forces_real(self):
        loss_fn = PatchAdversarialLoss(criterion="least_squares")
        logits = jnp.zeros((2, 1, 8, 8))
        with pytest.warns(UserWarning):
            loss = loss_fn(logits, target_is_real=False, for_discriminator=False)
        assert bool(jnp.isfinite(loss))

    def test_jukebox_loss(self):
        loss_fn = JukeboxLoss(spatial_dims=2)
        a = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
        assert float(loss_fn(a, a)) == pytest.approx(0.0, abs=1e-10)
        b = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16))
        assert float(loss_fn(a, b)) > 0

    def test_jukebox_matches_reference_formula(self):
        import torch

        a = np.random.RandomState(0).standard_normal((2, 1, 8, 8)).astype(np.float32)
        b = np.random.RandomState(1).standard_normal((2, 1, 8, 8)).astype(np.float32)
        ours = float(JukeboxLoss(spatial_dims=2)(jnp.asarray(a), jnp.asarray(b)))
        fa = torch.fft.fftn(torch.from_numpy(a), dim=(1, 2, 3), norm="ortho")
        fb = torch.fft.fftn(torch.from_numpy(b), dim=(1, 2, 3), norm="ortho")
        amp = lambda f: torch.sqrt(f.real**2 + f.imag**2)
        expected = float(torch.mean((amp(fa) - amp(fb)) ** 2))
        assert ours == pytest.approx(expected, rel=1e-4)


class TestEMAQuantizerGoldenParity:
    """Exact EMA-update parity against the reference implementation."""

    def _load_ref(self):
        import importlib.util
        import sys

        import pytest

        spec = importlib.util.spec_from_file_location(
            "ref_vector_quantizer",
            "/root/reference/generative/networks/layers/vector_quantizer.py",
        )
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except Exception:
            pytest.skip("reference quantizer not importable")
        return mod

    def test_training_updates_match_reference(self):
        import torch

        ref = self._load_ref()
        K, D = 8, 4
        rng = np.random.RandomState(0)
        codebook = rng.standard_normal((K, D)).astype(np.float32)

        theirs = ref.EMAQuantizer(
            spatial_dims=2, num_embeddings=K, embedding_dim=D, decay=0.7, ddp_sync=False
        )
        with torch.no_grad():
            theirs.embedding.weight.copy_(torch.from_numpy(codebook))
            theirs.ema_w.copy_(torch.from_numpy(codebook))
        theirs.train()

        q = EMAQuantizer(spatial_dims=2, num_embeddings=K, embedding_dim=D, decay=0.7,
                         ddp_sync=False)
        x0 = jnp.zeros((2, 4, 4, D))
        variables = q.init(jax.random.PRNGKey(0), x0)
        variables = {
            "codebook": {
                "embedding": jnp.asarray(codebook),
                "ema_cluster_size": jnp.zeros(K),
                "ema_w": jnp.asarray(codebook),
            }
        }

        for step in range(3):
            x = rng.standard_normal((2, 4, 4, D)).astype(np.float32)
            # ours: channels-last
            (quant_j, loss_j, idx_j), mutated = q.apply(
                variables, jnp.asarray(x), train=True, mutable=["codebook"]
            )
            variables = {"codebook": mutated["codebook"]}
            # theirs: channels-first
            xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
            quant_t, loss_t, idx_t = theirs(xt)

            np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
            np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(
                np.asarray(quant_j),
                np.transpose(quant_t.detach().numpy(), (0, 2, 3, 1)),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(variables["codebook"]["embedding"]),
                theirs.embedding.weight.detach().numpy(),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(variables["codebook"]["ema_cluster_size"]),
                theirs.ema_cluster_size.numpy(),
                rtol=1e-5, atol=1e-6,
            )


class TestFeatureMatchingLoss:
    def test_flat_and_multiscale(self):
        from generativemodels_tpu.losses import feature_matching_loss

        d = PatchDiscriminator(spatial_dims=2, num_channels=4, in_channels=1,
                               num_layers_d=2, norm="INSTANCE")
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 32, 32))
        y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32))
        v = d.init(jax.random.PRNGKey(2), x)
        real_feats = d.apply(v, x)[:-1]
        fake_feats = d.apply(v, y)[:-1]
        loss = feature_matching_loss(real_feats, fake_feats)
        assert float(loss) > 0
        assert float(feature_matching_loss(real_feats, real_feats)) == 0.0

        md = MultiScalePatchDiscriminator(
            num_d=2, num_layers_d=2, spatial_dims=2, num_channels=4, in_channels=1,
            pooling_method="avg", norm="INSTANCE", minimum_size_im=32,
        )
        mv = md.init(jax.random.PRNGKey(3), x)
        _, rf = md.apply(mv, x)
        _, ff = md.apply(mv, y)
        assert float(feature_matching_loss(rf, ff)) > 0

    def test_gradient_only_through_fake(self):
        from generativemodels_tpu.losses import feature_matching_loss

        real = [jnp.ones((2, 4))]
        g = jax.grad(lambda f: feature_matching_loss(real, [f]))(jnp.zeros((2, 4)))
        assert bool((jnp.abs(g) > 0).all())


class TestAdversarialLossGoldenParity:
    """Bit-level parity of PatchAdversarialLoss vs the reference torch module.

    Reference: generative/losses/adversarial_loss.py:29-170.
    """

    @pytest.mark.parametrize("criterion", ["bce", "hinge", "least_squares"])
    @pytest.mark.parametrize("reduction", ["mean", "sum"])
    def test_matches_reference(self, criterion, reduction):
        from .ref_loader import load_reference_losses

        ref = load_reference_losses()
        if ref is None:
            pytest.skip("reference losses not importable")
        import torch

        rng = np.random.default_rng(0)
        logits = [rng.normal(size=(2, 1, 8, 8)).astype(np.float32) for _ in range(3)]

        ours = PatchAdversarialLoss(criterion=criterion, reduction=reduction)
        theirs = ref.PatchAdversarialLoss(criterion=criterion, reduction=reduction)

        for target_is_real, for_disc in [(True, True), (False, True), (True, False)]:
            # single-tensor and multi-scale list inputs
            for inp in (logits[0], logits):
                j = ours(
                    [jnp.asarray(a) for a in inp] if isinstance(inp, list) else jnp.asarray(inp),
                    target_is_real, for_disc,
                )
                t = theirs(
                    [torch.from_numpy(a) for a in inp] if isinstance(inp, list) else torch.from_numpy(inp),
                    target_is_real, for_disc,
                )
                np.testing.assert_allclose(
                    np.asarray(j), t.detach().numpy(), rtol=1e-5, atol=1e-6,
                )

    def test_no_activation_leastsq(self):
        from .ref_loader import load_reference_losses

        ref = load_reference_losses()
        if ref is None:
            pytest.skip("reference losses not importable")
        import torch

        x = np.random.default_rng(1).normal(size=(2, 1, 4, 4)).astype(np.float32)
        ours = PatchAdversarialLoss(criterion="least_squares", no_activation_leastsq=True)
        theirs = ref.PatchAdversarialLoss(criterion="least_squares", no_activation_leastsq=True)
        np.testing.assert_allclose(
            np.asarray(ours(jnp.asarray(x), False, True)),
            theirs(torch.from_numpy(x), False, True).numpy(),
            rtol=1e-6, atol=1e-7,
        )


class TestJukeboxGoldenParity:
    """Parity vs generative/losses/spectral_loss.py (FFT-magnitude L2)."""

    @pytest.mark.parametrize("spatial_dims,shape", [(2, (2, 1, 16, 16)), (3, (2, 1, 8, 8, 8))])
    def test_matches_reference(self, spatial_dims, shape):
        import torch

        from .test_metrics import _load_ref_module

        class _LossReduction(str, __import__("enum").Enum):
            NONE = "none"
            MEAN = "mean"
            SUM = "sum"

        ref = _load_ref_module(
            "ref_spectral",
            "/root/reference/generative/losses/spectral_loss.py",
            extra_stubs={"monai.utils": {"LossReduction": _LossReduction}},
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=shape).astype(np.float32)
        y = rng.normal(size=shape).astype(np.float32)
        ours = JukeboxLoss(spatial_dims=spatial_dims)
        theirs = ref.JukeboxLoss(spatial_dims=spatial_dims)
        np.testing.assert_allclose(
            float(ours(jnp.asarray(x), jnp.asarray(y))),
            float(theirs(torch.from_numpy(x), torch.from_numpy(y))),
            rtol=1e-4, atol=1e-5,
        )
