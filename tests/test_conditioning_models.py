"""Tests for ControlNet, DecoderOnlyTransformer, and SPADE networks.

Mirrors reference tests/test_controlnet.py, test_transformer.py,
test_spade_autoencoderkl.py, test_spade_diffusion_model_unet.py,
test_spade_vaegan.py (shape/contract grids).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.networks.nets import (
    ControlNet,
    DecoderOnlyTransformer,
    DiffusionModelUNet,
    SPADEAutoencoderKL,
    SPADEDiffusionModelUNet,
    SPADENet,
    copy_weights_to_controlnet,
)


class TestDecoderOnlyTransformer:
    def test_shape(self):
        model = DecoderOnlyTransformer(
            num_tokens=10, max_seq_len=16, attn_layers_dim=8, attn_layers_depth=2,
            attn_layers_heads=2,
        )
        x = jnp.zeros((2, 16), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(variables, x)
        assert logits.shape == (2, 16, 10)

    def test_cross_attention(self):
        model = DecoderOnlyTransformer(
            num_tokens=10, max_seq_len=16, attn_layers_dim=8, attn_layers_depth=2,
            attn_layers_heads=2, with_cross_attention=True,
        )
        x = jnp.zeros((2, 16), jnp.int32)
        ctx = jnp.zeros((2, 3, 8))
        variables = model.init(jax.random.PRNGKey(0), x, context=ctx)
        logits = model.apply(variables, x, context=ctx)
        assert logits.shape == (2, 16, 10)

    def test_causality(self):
        """Changing a future token must not affect earlier logits."""
        model = DecoderOnlyTransformer(
            num_tokens=10, max_seq_len=8, attn_layers_dim=8, attn_layers_depth=1,
            attn_layers_heads=2,
        )
        x1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]]) % 10
        x2 = x1.at[0, -1].set(0)
        variables = model.init(jax.random.PRNGKey(0), x1)
        l1 = model.apply(variables, x1)
        l2 = model.apply(variables, x2)
        np.testing.assert_allclose(np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), rtol=1e-5)


class TestControlNet:
    def _models(self):
        kwargs = dict(
            spatial_dims=2, num_res_blocks=1, num_channels=(8, 8),
            attention_levels=(False, True), norm_num_groups=8, num_head_channels=8,
        )
        cn = ControlNet(in_channels=1, conditioning_embedding_num_channels=(8,), **kwargs)
        unet = DiffusionModelUNet(in_channels=1, out_channels=1, **kwargs)
        return cn, unet

    def test_output_structure(self):
        cn, _ = self._models()
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        cond = jnp.zeros((1, 1, 16, 16))
        variables = cn.init(jax.random.PRNGKey(0), x, t, cond)
        down, mid = cn.apply(variables, x, t, cond)
        # conv_in + level0 res + level0 down + level1 res = 4 residuals
        assert len(down) == 4
        assert mid.shape == (1, 8, 8, 8)
        # zero-init heads: fresh ControlNet outputs exactly zero
        for r in down:
            assert np.allclose(np.asarray(r), 0.0)
        assert np.allclose(np.asarray(mid), 0.0)

    def test_feeds_unet(self):
        cn, unet = self._models()
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        cond = jnp.zeros((1, 1, 16, 16))
        cn_vars = cn.init(jax.random.PRNGKey(0), x, t, cond)
        unet_vars = unet.init(jax.random.PRNGKey(1), x, t)
        down, mid = cn.apply(cn_vars, x, t, cond, conditioning_scale=0.5)
        out = unet.apply(
            unet_vars, x, t,
            down_block_additional_residuals=down, mid_block_additional_residual=mid,
        )
        assert out.shape == (1, 1, 16, 16)

    def test_weight_copy(self):
        cn, unet = self._models()
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        cond = jnp.zeros((1, 1, 16, 16))
        cn_vars = cn.init(jax.random.PRNGKey(0), x, t, cond)
        unet_vars = unet.init(jax.random.PRNGKey(1), x, t)
        new_params = copy_weights_to_controlnet(
            cn_vars["params"], unet_vars["params"], verbose=False
        )
        # conv_in kernels must now match the UNet's
        np.testing.assert_allclose(
            np.asarray(new_params["conv_in"]["kernel"]),
            np.asarray(unet_vars["params"]["conv_in"]["kernel"]),
        )


class TestSPADEAutoencoderKL:
    def test_roundtrip(self):
        model = SPADEAutoencoderKL(
            spatial_dims=2, label_nc=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(4, 4), attention_levels=(False, False), latent_channels=1,
            norm_num_groups=4, with_encoder_nonlocal_attn=False,
            with_decoder_nonlocal_attn=False, spade_intermediate_channels=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        seg = jnp.zeros((1, 3, 16, 16))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x, seg
        )
        recon, z_mu, z_sigma = model.apply(
            variables, x, seg, rngs={"sampling": jax.random.PRNGKey(2)}
        )
        assert recon.shape == (1, 1, 16, 16)
        img = model.apply(variables, z_mu, seg, method="decode_stage_2_outputs")
        assert img.shape == (1, 1, 16, 16)


class TestSPADEDiffusionModelUNet:
    def test_forward(self):
        model = SPADEDiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, label_nc=3, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8, spade_intermediate_channels=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        t = jnp.array([0])
        seg = jnp.zeros((1, 3, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), x, t, seg)
        out = model.apply(variables, x, t, seg)
        assert out.shape == (1, 1, 16, 16)
        assert model.label_nc == 3


class TestSPADENet:
    def test_vae_mode(self):
        model = SPADENet(
            spatial_dims=2, in_channels=1, out_channels=1, label_nc=3,
            input_shape=(16, 16), num_channels=(4, 8), z_dim=4, is_vae=True,
            spade_intermediate_channels=8,
        )
        seg = jnp.zeros((1, 3, 16, 16))
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, seg, x
        )
        img, kld = model.apply(variables, seg, x, rngs={"sampling": jax.random.PRNGKey(2)})
        assert img.shape == (1, 1, 16, 16)
        assert bool(jnp.isfinite(kld))

    def test_gan_mode(self):
        model = SPADENet(
            spatial_dims=2, in_channels=1, out_channels=1, label_nc=3,
            input_shape=(16, 16), num_channels=(4, 8), is_vae=False,
            spade_intermediate_channels=8,
        )
        seg = jnp.zeros((1, 3, 16, 16))
        variables = model.init(jax.random.PRNGKey(0), seg)
        (img,) = model.apply(variables, seg)
        assert img.shape == (1, 1, 16, 16)

    def test_invalid_input_shape(self):
        with pytest.raises(ValueError):
            model = SPADENet(
                spatial_dims=2, in_channels=1, out_channels=1, label_nc=3,
                input_shape=(15, 16), num_channels=(4, 8), z_dim=4, is_vae=True,
            )
            model.init(
                {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                jnp.zeros((1, 3, 15, 16)), jnp.zeros((1, 1, 15, 16)),
            )


class TestControlNet3D:
    def test_3d_controlnet_feeds_3d_unet(self):
        kwargs = dict(
            spatial_dims=3, num_res_blocks=1, num_channels=(8, 8),
            attention_levels=(False, False), norm_num_groups=8, num_head_channels=8,
        )
        cn = ControlNet(in_channels=1, conditioning_embedding_num_channels=(8,), **kwargs)
        unet = DiffusionModelUNet(in_channels=1, out_channels=1, **kwargs)
        x = jnp.zeros((1, 1, 16, 16, 16))
        t = jnp.array([0])
        cond = jnp.zeros((1, 1, 16, 16, 16))
        cn_vars = cn.init(jax.random.PRNGKey(0), x, t, cond)
        unet_vars = unet.init(jax.random.PRNGKey(1), x, t)
        down, mid = cn.apply(cn_vars, x, t, cond)
        out = unet.apply(unet_vars, x, t, down_block_additional_residuals=down,
                         mid_block_additional_residual=mid)
        assert out.shape == (1, 1, 16, 16, 16)
