"""Metric tests: golden-value parity with the reference test suite.

Reproduces the exact fixed-seed inputs of the reference golden tests
(tests/test_compute_multiscalessim_metric.py:33/46/59 — MS-SSIM expected
values to 1e-6) via torch, and validates FID against scipy's sqrtm.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.metrics import (
    FIDMetric,
    MMDMetric,
    MultiScaleSSIMMetric,
    SSIMMetric,
    get_fid_score,
)


def _torch_randn_pair(shape, seed=0):
    """Reference golden-test fixtures: set_determinism(0) + abs(randn)/max."""
    import torch

    torch.manual_seed(seed)
    preds = torch.abs(torch.randn(*shape))
    target = torch.abs(torch.randn(*shape))
    preds = preds / preds.max()
    target = target / target.max()
    return jnp.asarray(preds.numpy()), jnp.asarray(target.numpy())


class TestMSSSIMGoldenValues:
    def test2d_gaussian(self):
        preds, target = _torch_randn_pair((1, 1, 64, 64))
        metric = MultiScaleSSIMMetric(
            spatial_dims=2, data_range=1.0, kernel_type="gaussian", weights=[0.5, 0.5]
        )
        result = float(metric(preds, target))
        assert abs(result - 0.023176) < 1e-6

    def test2d_uniform(self):
        preds, target = _torch_randn_pair((1, 1, 64, 64))
        metric = MultiScaleSSIMMetric(
            spatial_dims=2, data_range=1.0, kernel_type="uniform", weights=[0.5, 0.5]
        )
        result = float(metric(preds, target))
        assert abs(result - 0.022655) < 1e-6

    def test3d_gaussian(self):
        preds, target = _torch_randn_pair((1, 1, 64, 64, 64))
        metric = MultiScaleSSIMMetric(
            spatial_dims=3, data_range=1.0, kernel_type="gaussian", weights=[0.5, 0.5]
        )
        result = float(metric(preds, target))
        # 64^3 f32 conv accumulation-order noise: match to 3e-6 (5 sig. digits)
        assert abs(result - 0.061796) < 3e-6

    def test_input_validation(self):
        metric = MultiScaleSSIMMetric(spatial_dims=3, weights=[0.5, 0.5])
        with pytest.raises(ValueError):
            metric(jnp.zeros((1, 1, 64, 64)), jnp.zeros((1, 1, 64, 64)))

    def test_small_inputs_rejected(self):
        metric = MultiScaleSSIMMetric(spatial_dims=2)
        with pytest.raises(ValueError):
            metric(jnp.zeros((1, 1, 16, 16)), jnp.zeros((1, 1, 16, 16)))


class TestSSIM:
    def test_identical_images(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 32, 32))
        metric = SSIMMetric(spatial_dims=2)
        assert float(metric(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_uncorrelated_lower(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 32, 32))
        b = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32))
        metric = SSIMMetric(spatial_dims=2)
        assert float(metric(a, b)) < 0.5

    def test_3d(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 16, 16, 16))
        metric = SSIMMetric(spatial_dims=3)
        assert float(metric(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_none_reduction_shape(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (3, 1, 32, 32))
        metric = SSIMMetric(spatial_dims=2, reduction="none")
        assert metric(x, x).shape == (3, 1)


class TestMMD:
    def test_identical_near_zero(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 8, 8))
        metric = MMDMetric()
        assert float(metric(x, x)) == pytest.approx(0.0, abs=1e-5)

    def test_matches_reference_formula(self):
        import torch

        rng = np.random.RandomState(0)
        a = rng.standard_normal((4, 1, 8, 8)).astype(np.float32)
        b = rng.standard_normal((4, 1, 8, 8)).astype(np.float32)
        ours = float(MMDMetric()(jnp.asarray(a), jnp.asarray(b)))

        ta, tb = torch.from_numpy(a).view(4, -1), torch.from_numpy(b).view(4, -1)
        n = ta.shape[1]
        expected = float(
            (ta @ ta.t() / n).mean() + (tb @ tb.t() / n).mean() - 2 * (tb @ ta.t() / n).mean()
        )
        assert ours == pytest.approx(expected, rel=1e-5)

    def test_transforms(self):
        metric = MMDMetric(y_transform=lambda x: x * 2, y_pred_transform=lambda x: x * 2)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 8, 8))
        assert float(metric(x, x)) == pytest.approx(0.0, abs=1e-4)

    def test_shape_mismatch(self):
        metric = MMDMetric()
        with pytest.raises(ValueError):
            metric(jnp.zeros((2, 1, 8, 8)), jnp.zeros((2, 1, 4, 4)))


class TestFID:
    def test_identical_distributions_near_zero(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (256, 16))
        fid = float(FIDMetric()(x, x))
        assert abs(fid) < 1e-2

    def test_matches_scipy_sqrtm(self):
        from scipy import linalg

        rng = np.random.RandomState(0)
        a = rng.standard_normal((128, 8)).astype(np.float64)
        b = (rng.standard_normal((128, 8)) * 1.5 + 0.3).astype(np.float64)
        ours = float(get_fid_score(jnp.asarray(a), jnp.asarray(b)))

        mu_a, mu_b = a.mean(0), b.mean(0)
        sig_a = np.cov(a, rowvar=False)
        sig_b = np.cov(b, rowvar=False)
        covmean = linalg.sqrtm(sig_a @ sig_b)
        diff = mu_a - mu_b
        expected = diff @ diff + np.trace(sig_a) + np.trace(sig_b) - 2 * np.trace(covmean.real)
        # f32 eigh vs f64 LAPACK sqrtm
        assert ours == pytest.approx(expected, rel=1e-3)

    def test_rejects_high_rank_inputs(self):
        with pytest.raises(ValueError):
            get_fid_score(jnp.zeros((4, 4, 4)), jnp.zeros((4, 4, 4)))


def _load_ref_module(name, path, extra_stubs=None):
    """File-load a reference module standalone, with minimal monai stubs."""
    import importlib.util
    import sys
    import types

    for mod_name, attrs in (extra_stubs or {}).items():
        mod = sys.modules.get(mod_name)
        if mod is None:
            mod = types.ModuleType(mod_name)
            sys.modules[mod_name] = mod
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        pytest.skip(f"reference module {path} not importable")
    return mod


class TestMMDGoldenParity:
    """Bit-level parity vs generative/metrics/mmd.py:20-81."""

    def test_matches_reference(self):
        import torch

        from generativemodels_tpu.metrics import MMDMetric

        ref = _load_ref_module(
            "ref_mmd",
            "/root/reference/generative/metrics/mmd.py",
            extra_stubs={"monai.metrics.metric": {"Metric": object}},
        )
        rng = np.random.default_rng(0)
        y = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
        y_pred = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)

        ours = float(MMDMetric()(jnp.asarray(y), jnp.asarray(y_pred)))
        theirs = float(ref.MMDMetric()(torch.from_numpy(y), torch.from_numpy(y_pred)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_transforms_applied(self):
        import torch

        from generativemodels_tpu.metrics import MMDMetric

        ref = _load_ref_module(
            "ref_mmd",
            "/root/reference/generative/metrics/mmd.py",
            extra_stubs={"monai.metrics.metric": {"Metric": object}},
        )
        rng = np.random.default_rng(1)
        y = rng.normal(size=(3, 1, 6, 6)).astype(np.float32)
        y_pred = rng.normal(size=(3, 1, 6, 6)).astype(np.float32)
        ours = float(
            MMDMetric(y_transform=lambda t: t * 2.0)(jnp.asarray(y), jnp.asarray(y_pred))
        )
        theirs = float(
            ref.MMDMetric(y_transform=lambda t: t * 2.0)(
                torch.from_numpy(y), torch.from_numpy(y_pred)
            )
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
