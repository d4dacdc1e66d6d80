"""Block-level tests: SpatialRescaler, SPADE norm, MLPBlock, SABlock.

Mirrors reference tests/test_encoder_modules.py, test_spade_norm.py (if
present) and the transformer block suites.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.networks.blocks import (
    MLPBlock,
    SABlock,
    SPADE,
    SpatialRescaler,
)


class TestSpatialRescaler:
    def test_downscale_by_multiplier(self):
        r = SpatialRescaler(spatial_dims=2, n_stages=1, multiplier=0.5, method="bilinear")
        x = jnp.zeros((1, 3, 16, 16))  # public channels-first layout
        v = r.init(jax.random.PRNGKey(0), x)
        out = r.apply(v, x)
        assert out.shape == (1, 3, 8, 8)

    def test_fixed_size(self):
        r = SpatialRescaler(spatial_dims=2, n_stages=1, size=(4, 6), method="nearest")
        x = jnp.zeros((2, 1, 16, 16))
        v = r.init(jax.random.PRNGKey(0), x)
        assert r.apply(v, x).shape == (2, 1, 4, 6)

    def test_channel_mapper(self):
        r = SpatialRescaler(spatial_dims=2, multiplier=0.5, in_channels=3, out_channels=2)
        x = jnp.zeros((1, 3, 8, 8))
        v = r.init(jax.random.PRNGKey(0), x)
        assert r.apply(v, x).shape == (1, 2, 4, 4)

    def test_validation(self):
        with pytest.raises(ValueError):
            SpatialRescaler(method="bogus").init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4, 4)))
        with pytest.raises(ValueError):
            SpatialRescaler(size=(4, 4), n_stages=2).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 1, 4, 4))
            )

    def test_3d_trilinear(self):
        r = SpatialRescaler(spatial_dims=3, multiplier=0.5, method="trilinear")
        x = jnp.zeros((1, 1, 8, 8, 8))
        v = r.init(jax.random.PRNGKey(0), x)
        assert r.apply(v, x).shape == (1, 1, 4, 4, 4)

    @pytest.mark.parametrize("method", ["nearest", "bilinear", "bicubic", "area"])
    @pytest.mark.parametrize("mult", [0.5, 0.4, 2.0])
    def test_golden_vs_torch_interpolate(self, method, mult):
        """torch F.interpolate semantics bit-for-bit: nearest's floor index
        convention, linear/cubic WITHOUT antialias, area = adaptive avg
        pool (reference encoder_modules.py:60 builds exactly this
        partial)."""
        torch = pytest.importorskip("torch")

        rs = np.random.RandomState(3)
        x = rs.randn(2, 3, 16, 16).astype(np.float32)
        r = SpatialRescaler(spatial_dims=2, n_stages=1, multiplier=mult, method=method)
        v = r.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(r.apply(v, jnp.asarray(x)))
        with torch.no_grad():
            ref = torch.nn.functional.interpolate(
                torch.from_numpy(x), mode=method, scale_factor=mult
            ).numpy()
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5, err_msg=method)

    def test_golden_vs_torch_interpolate_3d_nearest(self):
        torch = pytest.importorskip("torch")

        rs = np.random.RandomState(4)
        x = rs.randn(1, 2, 8, 8, 8).astype(np.float32)
        r = SpatialRescaler(spatial_dims=3, n_stages=1, multiplier=0.5, method="nearest")
        v = r.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(r.apply(v, jnp.asarray(x)))
        with torch.no_grad():
            ref = torch.nn.functional.interpolate(
                torch.from_numpy(x), mode="nearest", scale_factor=0.5
            ).numpy()
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


class TestSPADENorm:
    @pytest.mark.parametrize("norm", ["INSTANCE", "GROUP"])
    def test_shapes_and_seg_resize(self, norm):
        spade = SPADE(
            label_nc=3, norm_nc=8, spatial_dims=2, hidden_channels=8, norm=norm,
            norm_params={"num_groups": 4} if norm == "GROUP" else None,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
        seg = jnp.zeros((2, 16, 16, 3))  # different spatial size: auto-resized
        v = spade.init(jax.random.PRNGKey(1), x, seg)
        out = spade.apply(v, x, seg)
        assert out.shape == x.shape

    def test_seg_modulates_output(self):
        spade = SPADE(label_nc=1, norm_nc=4, spatial_dims=2, hidden_channels=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        seg_a = jnp.zeros((1, 8, 8, 1))
        seg_b = jnp.ones((1, 8, 8, 1))
        v = spade.init(jax.random.PRNGKey(1), x, seg_a)
        out_a = spade.apply(v, x, seg_a)
        out_b = spade.apply(v, x, seg_b)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


class TestMLPBlock:
    def test_gelu(self):
        m = MLPBlock(hidden_size=8, mlp_dim=16, act="GELU")
        x = jnp.zeros((2, 4, 8))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 4, 8)
        # GELU first projection: (8 -> 16)
        assert v["params"]["linear1"]["kernel"].shape == (8, 16)

    def test_geglu_doubles_projection(self):
        m = MLPBlock(hidden_size=8, mlp_dim=16, act="GEGLU")
        x = jnp.zeros((2, 4, 8))
        v = m.init(jax.random.PRNGKey(0), x)
        assert v["params"]["linear1"]["kernel"].shape == (8, 32)
        assert m.apply(v, x).shape == (2, 4, 8)

    def test_bad_act(self):
        with pytest.raises(ValueError):
            MLPBlock(hidden_size=8, mlp_dim=16, act="SWISH").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 2, 8))
            )


class TestSABlockContract:
    def test_validation(self):
        with pytest.raises(ValueError):
            SABlock(hidden_size=8, num_heads=3)
        with pytest.raises(ValueError):
            SABlock(hidden_size=8, num_heads=2, dropout_rate=1.5)

    def test_cross_attention_kv_from_context(self):
        blk = SABlock(hidden_size=8, num_heads=2, with_cross_attention=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
        v = blk.init(jax.random.PRNGKey(2), x, context=ctx)
        out = blk.apply(v, x, context=ctx)
        assert out.shape == (1, 4, 8)
        # different context -> different output
        out2 = blk.apply(v, x, context=ctx * 2)
        assert not np.allclose(np.asarray(out), np.asarray(out2))
