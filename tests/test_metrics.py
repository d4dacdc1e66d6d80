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


def _monai_metric_stubs():
    """Shared monai stubs for file-loading the reference metric modules."""
    import enum

    import torch

    class _MetricReduction(str, enum.Enum):
        NONE = "none"
        MEAN = "mean"
        SUM = "sum"

    class _StrEnum(str, enum.Enum):
        def __str__(self):
            return self.value

    class _RegressionMetric:
        def __init__(self, *args, **kwargs):
            pass

    def _ensure_tuple_rep(val, dim):
        if isinstance(val, (tuple, list)):
            return tuple(val)
        return (val,) * dim

    def _convert_data_type(data, output_type=None, dtype=None, **kwargs):
        return torch.as_tensor(data, dtype=dtype), None, None

    def _convert_to_dst_type(src, dst, **kwargs):
        return torch.as_tensor(src, dtype=dst.dtype, device=dst.device), None, None

    return {
        "monai.metrics.metric": {"Metric": object},
        "monai.metrics.regression": {"RegressionMetric": _RegressionMetric},
        "monai.utils.type_conversion": {"convert_to_dst_type": _convert_to_dst_type},
        "monai.utils": {
            "MetricReduction": _MetricReduction,
            "StrEnum": _StrEnum,
            "ensure_tuple_rep": _ensure_tuple_rep,
            "convert_data_type": _convert_data_type,
        },
    }


class TestFIDGoldenParity:
    """Parity vs generative/metrics/fid.py:20-119 (scipy sqrtm path)."""

    def test_matches_reference(self, monkeypatch):
        import torch

        from generativemodels_tpu.metrics import FIDMetric

        # the reference uses np.float_, removed in numpy 2.0
        monkeypatch.setattr(np, "float_", np.float64, raising=False)
        ref = _load_ref_module(
            "ref_fid", "/root/reference/generative/metrics/fid.py",
            extra_stubs=_monai_metric_stubs(),
        )
        rng = np.random.default_rng(0)
        a = rng.normal(size=(64, 16)).astype(np.float32)
        b = (rng.normal(size=(64, 16)) * 1.3 + 0.5).astype(np.float32)
        ours = float(FIDMetric()(jnp.asarray(a), jnp.asarray(b)))
        theirs = float(ref.FIDMetric()(torch.from_numpy(a), torch.from_numpy(b)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


class TestSSIMGoldenParity:
    """Parity vs generative/metrics/{ssim,ms_ssim}.py."""

    def _load(self):
        import sys
        import types

        stubs = _monai_metric_stubs()
        ssim_mod = _load_ref_module(
            "ref_ssim", "/root/reference/generative/metrics/ssim.py", extra_stubs=stubs
        )
        # pre-seed the package path ms_ssim.py imports from, without running
        # the reference package __init__ (which needs scipy-era numpy)
        if "generative" not in sys.modules:
            pkg = types.ModuleType("generative")
            pkg.__path__ = ["/root/reference/generative"]
            sys.modules["generative"] = pkg
        if "generative.metrics" not in sys.modules:
            sub = types.ModuleType("generative.metrics")
            sub.__path__ = ["/root/reference/generative/metrics"]
            sys.modules["generative.metrics"] = sub
        sys.modules.setdefault("generative.metrics.ssim", ssim_mod)
        ms_mod = _load_ref_module(
            "ref_ms_ssim", "/root/reference/generative/metrics/ms_ssim.py",
            extra_stubs=stubs,
        )
        return ssim_mod, ms_mod

    @pytest.mark.parametrize("spatial_dims,shape", [(2, (2, 1, 48, 48)), (3, (1, 1, 32, 32, 32))])
    def test_ssim_matches_reference(self, spatial_dims, shape):
        import torch

        from generativemodels_tpu.metrics import SSIMMetric

        ssim_mod, _ = self._load()
        rng = np.random.default_rng(0)
        a = rng.uniform(size=shape).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.1, size=shape), 0, 1).astype(np.float32)
        ours = np.asarray(SSIMMetric(spatial_dims=spatial_dims, reduction="none")(jnp.asarray(a), jnp.asarray(b)))
        theirs = (
            ssim_mod.SSIMMetric(spatial_dims=spatial_dims)
            ._compute_metric(torch.from_numpy(a), torch.from_numpy(b))
            .numpy()
        )
        np.testing.assert_allclose(ours.reshape(-1), theirs.reshape(-1), rtol=1e-4, atol=1e-5)

    def test_ms_ssim_matches_reference(self):
        import torch

        from generativemodels_tpu.metrics import MultiScaleSSIMMetric

        _, ms_mod = self._load()
        rng = np.random.default_rng(1)
        shape = (2, 1, 64, 64)
        a = rng.uniform(size=shape).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.05, size=shape), 0, 1).astype(np.float32)
        w = (0.25, 0.25, 0.5)
        ours = np.asarray(MultiScaleSSIMMetric(spatial_dims=2, weights=w, reduction="none")(jnp.asarray(a), jnp.asarray(b)))
        theirs = (
            ms_mod.MultiScaleSSIMMetric(spatial_dims=2, weights=list(w))
            ._compute_metric(torch.from_numpy(a), torch.from_numpy(b))
            .numpy()
        )
        np.testing.assert_allclose(ours.reshape(-1), theirs.reshape(-1), rtol=1e-4, atol=1e-5)
