"""Tests for utils: ComponentStore, Ordering, unsqueeze helpers.

Mirrors reference tests/test_ordering.py + component-store usage.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from generativemodels_tpu.utils import ComponentStore, Ordering, unsqueeze_left, unsqueeze_right


class TestMisc:
    def test_unsqueeze_right(self):
        x = jnp.ones((2, 3))
        assert unsqueeze_right(x, 4).shape == (2, 3, 1, 1)

    def test_unsqueeze_left(self):
        x = jnp.ones((2, 3))
        assert unsqueeze_left(x, 4).shape == (1, 1, 2, 3)


class TestComponentStore:
    def test_add_and_get(self):
        store = ComponentStore("Test", "test store")

        @store.add_def("my_func", "doubles")
        def _f(x):
            return x * 2

        assert "my_func" in store
        assert store["my_func"](3) == 6
        assert store.my_func(4) == 8
        assert len(store) == 1
        assert dict(iter(store))["my_func"] is _f

    def test_invalid_name(self):
        store = ComponentStore("Test", "test store")
        with pytest.raises(ValueError):
            store.add("not a var!", "desc", 1)

    def test_missing(self):
        store = ComponentStore("Test", "test store")
        with pytest.raises(ValueError):
            store["nope"]


class TestOrdering:
    def test_raster_2d(self):
        o = Ordering("raster_scan", 2, (1, 2, 3))
        np.testing.assert_array_equal(o.get_sequence_ordering(), np.arange(6))

    def test_s_curve_2d(self):
        o = Ordering("s_curve", 2, (1, 3, 3))
        np.testing.assert_array_equal(
            o.get_sequence_ordering(), [0, 1, 2, 5, 4, 3, 6, 7, 8]
        )

    def test_s_curve_3d(self):
        # rows x cols x depth = 2 x 2 x 2; template = arange(8).reshape(2,2,2)
        # r0: c0 (d:0,1) -> 0,1 ; c1 (odd c, d reversed) -> 3,2
        # r1 (odd): cols reversed: c1 -> 7,6 ; c0 -> 4,5
        o = Ordering("s_curve", 3, (1, 2, 2, 2))
        np.testing.assert_array_equal(o.get_sequence_ordering(), [0, 1, 3, 2, 7, 6, 4, 5])

    def test_random_is_permutation(self):
        o = Ordering("random", 2, (1, 4, 4))
        assert sorted(o.get_sequence_ordering().tolist()) == list(range(16))

    def test_revert_roundtrip(self):
        o = Ordering("s_curve", 2, (1, 5, 7))
        seq = o.get_sequence_ordering()
        rev = o.get_revert_sequence_ordering()
        x = np.arange(35)
        np.testing.assert_array_equal(x[seq][rev], x)

    def test_transforms(self):
        base = np.arange(6).reshape(2, 3)
        o = Ordering("raster_scan", 2, (1, 2, 3), transpositions_axes=((1, 0),))
        np.testing.assert_array_equal(o.get_sequence_ordering(), base.T.ravel())
        o = Ordering("raster_scan", 2, (1, 2, 3), reflected_spatial_dims=(True, False))
        np.testing.assert_array_equal(o.get_sequence_ordering(), base[::-1].ravel())
        o = Ordering("raster_scan", 2, (1, 2, 3), rot90_axes=((0, 1),))
        np.testing.assert_array_equal(o.get_sequence_ordering(), np.rot90(base).ravel())

    def test_validation(self):
        with pytest.raises(ValueError):
            Ordering("bogus", 2, (1, 2, 3))
        with pytest.raises(ValueError):
            Ordering("raster_scan", 2, (2, 3))
        with pytest.raises(ValueError):
            Ordering("raster_scan", 2, (1, 2, 3), transformation_order=("transpose", "transpose"))
        with pytest.raises(ValueError):
            Ordering("raster_scan", 2, (1, 2, 3), transformation_order=("bogus",))


class TestOrderingGoldenParity:
    """Golden parity against the reference Ordering implementation."""

    @staticmethod
    def _ref_ordering(**kwargs):
        import pytest

        from .ref_loader import _install_monai_stub, REFERENCE_PATH
        import sys

        _install_monai_stub()
        if REFERENCE_PATH not in sys.path:
            sys.path.insert(0, REFERENCE_PATH)
        try:
            from generative.utils.ordering import Ordering as RefOrdering
        except Exception:
            pytest.skip("reference not importable")
        return RefOrdering(**kwargs)

    @pytest.mark.parametrize("ordering_type", ["raster_scan", "s_curve"])
    @pytest.mark.parametrize("dims", [(1, 4, 5), (1, 3, 4, 5)])
    def test_matches_reference(self, ordering_type, dims):
        spatial_dims = len(dims) - 1
        ref = self._ref_ordering(
            ordering_type=ordering_type, spatial_dims=spatial_dims, dimensions=dims
        )
        ours = Ordering(ordering_type, spatial_dims, dims)
        np.testing.assert_array_equal(
            ours.get_sequence_ordering(), ref.get_sequence_ordering()
        )
        np.testing.assert_array_equal(
            ours.get_revert_sequence_ordering(), ref.get_revert_sequence_ordering()
        )

    def test_transforms_match_reference(self):
        kwargs = dict(
            ordering_type="s_curve", spatial_dims=2, dimensions=(1, 4, 6),
            reflected_spatial_dims=(True, False),
            transpositions_axes=((1, 0),),
            rot90_axes=((0, 1),),
        )
        ref = self._ref_ordering(**kwargs)
        ours = Ordering(**kwargs)
        np.testing.assert_array_equal(
            ours.get_sequence_ordering(), ref.get_sequence_ordering()
        )

    @pytest.mark.parametrize("dims", [(4, 5, None), (2, 3, 4)])
    def test_idx_helpers_match_reference(self, dims):
        """raster_scan_idx / s_curve_idx / random_idx golden vs reference
        (generative/utils/ordering.py:155,172,191)."""
        ref_cls = type(self._ref_ordering(
            ordering_type="raster_scan", spatial_dims=2, dimensions=(1, 2, 2)
        ))
        r, c, d = dims
        np.testing.assert_array_equal(
            Ordering.raster_scan_idx(r, c, d), ref_cls.raster_scan_idx(r, c, d)
        )
        np.testing.assert_array_equal(
            Ordering.s_curve_idx(r, c, d), ref_cls.s_curve_idx(r, c, d)
        )
        ours = Ordering.random_idx(r, c, d)
        ref = ref_cls.random_idx(r, c, d)
        assert sorted(map(tuple, ours)) == sorted(map(tuple, ref))
