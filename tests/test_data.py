"""Native data pipeline tests: NIfTI roundtrip + threaded prefetch loader."""
import os
import tempfile

import numpy as np
import pytest

from generativemodels_tpu.data import PrefetchNiftiLoader, read_nifti, write_nifti
from generativemodels_tpu.data.native import _read_nifti_py


@pytest.fixture(scope="module")
def nifti_dir():
    d = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        vol = rng.rand(8, 16, 16).astype(np.float32)
        p = os.path.join(d, f"vol_{i}.nii")
        write_nifti(p, vol)
        paths.append((p, vol))
    # also a gzipped one
    import gzip, shutil
    gz = os.path.join(d, "vol_gz.nii.gz")
    with open(paths[0][0], "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    return d, paths, gz


class TestNiftiIO:
    def test_native_roundtrip(self, nifti_dir):
        _, paths, _ = nifti_dir
        p, vol = paths[0]
        out = read_nifti(p, native=True)
        assert out.shape == vol.shape
        np.testing.assert_allclose(out, vol, rtol=1e-6)

    def test_python_fallback_matches_native(self, nifti_dir):
        _, paths, _ = nifti_dir
        p, vol = paths[1]
        np.testing.assert_allclose(_read_nifti_py(p), read_nifti(p, native=True))

    def test_gzip(self, nifti_dir):
        _, paths, gz = nifti_dir
        np.testing.assert_allclose(read_nifti(gz, native=True), paths[0][1], rtol=1e-6)
        np.testing.assert_allclose(_read_nifti_py(gz), paths[0][1], rtol=1e-6)

    def test_bad_file_raises(self):
        with tempfile.NamedTemporaryFile(suffix=".nii") as f:
            f.write(b"not a nifti")
            f.flush()
            with pytest.raises(IOError):
                read_nifti(f.name)


class TestPrefetchLoader:
    def test_loads_all_volumes(self, nifti_dir):
        _, paths, _ = nifti_dir
        loader = PrefetchNiftiLoader([p for p, _ in paths], num_workers=3, max_queue=2)
        vols = list(loader)
        loader.close()
        assert len(vols) == len(paths)
        # order is nondeterministic across workers; match by content sums
        got = sorted(float(v.sum()) for v in vols)
        expected = sorted(float(v.sum()) for _, v in paths)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_looping_loader(self, nifti_dir):
        _, paths, _ = nifti_dir
        loader = PrefetchNiftiLoader([p for p, _ in paths[:2]], num_workers=2,
                                     max_queue=2, loop=True)
        it = iter(loader)
        for _ in range(7):  # more than the file count -> loops
            v = next(it)
            assert v.shape == (8, 16, 16)
        loader.close()


class TestPipeline:
    def test_batched_and_prefetch(self, nifti_dir):
        import jax

        from generativemodels_tpu.data import batched, file_dataset, prefetch_to_device

        d, paths, _ = nifti_dir
        source = batched(file_dataset(d, pattern="vol_*.nii", loop=False), batch_size=2)
        batches = list(prefetch_to_device(source, size=2))
        assert len(batches) == 3  # 6 volumes / batch 2
        assert batches[0].shape == (2, 8, 16, 16)
        assert isinstance(batches[0], jax.Array)

    def test_npy_dataset(self, tmp_path):
        from generativemodels_tpu.data import batched, file_dataset

        for i in range(4):
            np.save(tmp_path / f"img_{i}.npy", np.full((4, 4), float(i), np.float32))
        it = file_dataset(str(tmp_path), loop=False)
        vals = sorted(float(a[0, 0]) for a in it)
        assert vals == [0.0, 1.0, 2.0, 3.0]
        b = next(batched(file_dataset(str(tmp_path), loop=True), 4))
        assert b.shape == (4, 4, 4)


    def test_png_dataset(self, tmp_path):
        """MedNIST-style directory of 2D PNGs (threaded PIL decode)."""
        from PIL import Image

        from generativemodels_tpu.data import batched, file_dataset

        for i in range(4):
            Image.fromarray(
                np.full((8, 8), i * 50, np.uint8)
            ).save(tmp_path / f"img_{i}.png")
        it = file_dataset(str(tmp_path), loop=False)
        arrs = list(it)
        assert len(arrs) == 4
        assert arrs[0].shape == (8, 8) and arrs[0].dtype == np.float32
        vals = sorted(round(float(a[0, 0]), 4) for a in arrs)
        assert vals == [0.0, round(50 / 255, 4), round(100 / 255, 4), round(150 / 255, 4)]
        b = next(batched(file_dataset(str(tmp_path), loop=True), 4))
        assert b.shape == (4, 8, 8)

    def test_image_normalization_uses_dtype_range(self, tmp_path):
        """Near-black uint8 and 16-bit images both scale by the dtype max."""
        from PIL import Image

        from generativemodels_tpu.data import file_dataset

        Image.fromarray(np.full((4, 4), 1, np.uint8)).save(tmp_path / "a_dark.png")
        Image.fromarray(np.full((4, 4), 65535, np.uint16), mode="I;16").save(
            tmp_path / "b_wide.png"
        )
        dark, wide = list(file_dataset(str(tmp_path), loop=False))
        assert abs(float(dark[0, 0]) - 1 / 255) < 1e-6
        assert abs(float(wide[0, 0]) - 1.0) < 1e-6

    def test_image_stream_bounded_and_abandonable(self, tmp_path):
        """A looping image stream yields promptly and can be abandoned
        without draining an epoch of queued decodes (ADVICE round 2)."""
        from PIL import Image

        from generativemodels_tpu.data import file_dataset

        for i in range(32):
            Image.fromarray(np.full((4, 4), i, np.uint8)).save(
                tmp_path / f"img_{i:02d}.png"
            )
        it = file_dataset(str(tmp_path), num_workers=2, loop=True)
        got = [next(it) for _ in range(5)]
        assert all(a.shape == (4, 4) for a in got)
        it.close()  # must return promptly (only the small window drains)

    def test_missing_dir(self):
        from generativemodels_tpu.data import file_dataset

        with pytest.raises(FileNotFoundError):
            next(file_dataset("/nonexistent_dir_xyz"))


class TestNativeImageDecode:
    """C++ libpng/libjpeg decoders vs PIL (native/dataloader.cpp)."""

    @pytest.fixture(autouse=True)
    def _need_lib(self):
        from generativemodels_tpu.data import native

        try:
            native.load_library()
        except Exception:
            pytest.skip("native library unavailable")

    def _pil_ref(self, path):
        from PIL import Image

        with Image.open(path) as im:
            raw = np.asarray(im)
        arr = raw.astype(np.float32)
        if np.issubdtype(raw.dtype, np.integer):
            arr = arr / float(np.iinfo(raw.dtype).max)
        return arr

    def test_png_gray8_rgb8_gray16(self, tmp_path):
        from PIL import Image

        from generativemodels_tpu.data.native import read_image

        rng = np.random.RandomState(0)
        cases = {
            "g8.png": rng.randint(0, 256, (13, 9), dtype=np.uint8),
            "rgb8.png": rng.randint(0, 256, (7, 11, 3), dtype=np.uint8),
        }
        for name, arr in cases.items():
            Image.fromarray(arr).save(tmp_path / name)
        Image.fromarray(
            rng.randint(0, 65536, (6, 5), dtype=np.uint16), mode="I;16"
        ).save(tmp_path / "g16.png")

        for name in [*cases, "g16.png"]:
            p = str(tmp_path / name)
            out = read_image(p)
            ref = self._pil_ref(p)
            assert out.shape == ref.shape, name
            np.testing.assert_allclose(out, ref, atol=1e-6, err_msg=name)

    def test_png_palette(self, tmp_path):
        from PIL import Image

        from generativemodels_tpu.data.native import read_image

        rng = np.random.RandomState(1)
        im = Image.fromarray(
            rng.randint(0, 256, (9, 9, 3), dtype=np.uint8)
        ).convert("P", palette=Image.ADAPTIVE)
        im.save(tmp_path / "pal.png")
        out = read_image(str(tmp_path / "pal.png"))
        # PIL decodes palette PNGs to indices; convert to RGB for the ref
        with Image.open(tmp_path / "pal.png") as ref_im:
            ref = np.asarray(ref_im.convert("RGB")).astype(np.float32) / 255.0
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_jpeg_gray_and_rgb(self, tmp_path):
        from PIL import Image

        from generativemodels_tpu.data.native import read_image

        rng = np.random.RandomState(2)
        Image.fromarray(rng.randint(0, 256, (16, 16), dtype=np.uint8)).save(
            tmp_path / "g.jpg", quality=95
        )
        Image.fromarray(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)).save(
            tmp_path / "c.jpeg", quality=95
        )
        for name in ("g.jpg", "c.jpeg"):
            p = str(tmp_path / name)
            out = read_image(p)
            ref = self._pil_ref(p)
            assert out.shape == ref.shape, name
            # same libjpeg under both decoders; allow 1-2 LSB of drift
            np.testing.assert_allclose(out, ref, atol=2 / 255, err_msg=name)

    def test_prefetch_loader_dispatches_images(self, tmp_path):
        from PIL import Image

        from generativemodels_tpu.data.native import PrefetchLoader

        for i in range(5):
            Image.fromarray(np.full((6, 6), 40 * i, np.uint8)).save(
                tmp_path / f"i{i}.png"
            )
        loader = PrefetchLoader(
            sorted(str(p) for p in tmp_path.glob("*.png")), num_workers=2
        )
        arrs = list(loader)
        assert len(arrs) == 5
        assert all(a.shape == (6, 6) and a.dtype == np.float32 for a in arrs)
        vals = sorted(round(float(a[0, 0]) * 255) for a in arrs)
        assert vals == [0, 40, 80, 120, 160]

    def test_corrupt_file_skipped(self, tmp_path):
        from PIL import Image

        from generativemodels_tpu.data.native import PrefetchLoader

        Image.fromarray(np.full((4, 4), 7, np.uint8)).save(tmp_path / "ok.png")
        (tmp_path / "bad.png").write_bytes(b"not a png at all")
        loader = PrefetchLoader(
            [str(tmp_path / "bad.png"), str(tmp_path / "ok.png")], num_workers=1
        )
        arrs = list(loader)
        assert len(arrs) == 1 and round(float(arrs[0][0, 0]) * 255) == 7


class TestShuffle:
    def test_epoch_shuffle_deterministic_and_varied(self, tmp_path):
        """shuffle=True re-randomizes order each epoch, reproducibly."""
        from PIL import Image

        from generativemodels_tpu.data import file_dataset

        n = 16
        for i in range(n):
            Image.fromarray(np.full((4, 4), i, np.uint8)).save(
                tmp_path / f"i{i:02d}.png"
            )

        def two_epochs(seed):
            it = file_dataset(str(tmp_path), num_workers=1, loop=True,
                              shuffle=True, seed=seed)
            vals = [round(float(next(it)[0, 0]) * 255) for _ in range(2 * n)]
            return vals[:n], vals[n:]

        e0_a, e1_a = two_epochs(seed=3)
        e0_b, e1_b = two_epochs(seed=3)
        assert e0_a == e0_b and e1_a == e1_b  # deterministic given seed
        assert sorted(e0_a) == list(range(n)) == sorted(e1_a)  # full epochs
        assert e0_a != e1_a  # reshuffled across epochs
        assert e0_a != list(range(n))  # actually shuffled
        e0_c, _ = two_epochs(seed=4)
        assert e0_c != e0_a  # seed changes the order

    def test_shuffle_off_preserves_sorted_order(self, tmp_path):
        from generativemodels_tpu.data import file_dataset

        for i in range(6):
            np.save(tmp_path / f"s{i}.npy", np.full((2, 2), i, np.float32))
        vals = [int(a[0, 0]) for a in file_dataset(str(tmp_path), loop=False)]
        assert vals == list(range(6))


class TestTransforms:
    """Host-side spatial/intensity fitting (data/transforms.py)."""

    def test_center_crop_or_pad(self):
        from generativemodels_tpu.data.transforms import center_crop_or_pad

        a = np.arange(5 * 7, dtype=np.float32).reshape(5, 7)
        out = center_crop_or_pad(a, (3, 9))
        assert out.shape == (3, 9)
        np.testing.assert_array_equal(out[:, 1:8], a[1:4])  # rows center-cropped
        assert float(out[:, 0].sum()) == 0.0 and float(out[:, 8].sum()) == 0.0

    def test_crop_pad_preserves_leading_dims(self):
        from generativemodels_tpu.data.transforms import center_crop_or_pad

        a = np.ones((2, 10, 10, 10), np.float32)  # (C, D, H, W)
        out = center_crop_or_pad(a, (8, 12, 10))
        assert out.shape == (2, 8, 12, 10)

    def test_resize_linear(self):
        from generativemodels_tpu.data.transforms import resize

        a = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
        out = resize(a, (8, 8))
        assert out.shape == (8, 8)
        # linear resize of a linear ramp stays within range, monotone rows
        assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5
        assert np.all(np.diff(out[4]) >= -1e-5)

    def test_scale_intensity(self):
        from generativemodels_tpu.data.transforms import scale_intensity

        a = np.asarray([[10.0, 30.0], [20.0, 10.0]])
        out = scale_intensity(a)
        assert float(out.min()) == 0.0 and float(out.max()) == 1.0
        flat = scale_intensity(np.full((3, 3), 5.0))
        assert float(np.abs(flat).max()) == 0.0

    def test_fit_sample_modes(self):
        from generativemodels_tpu.data.transforms import fit_sample

        a = np.random.RandomState(0).rand(24, 24, 15).astype(np.float32)
        assert fit_sample(a, (16, 16, 16)).shape == (16, 16, 16)
        assert fit_sample(a, (16, 16, 16), mode="resize").shape == (16, 16, 16)
        with pytest.raises(ValueError):
            fit_sample(a, (16, 16, 16), mode="bogus")

    def test_fitted_stream_none_passthrough(self):
        from generativemodels_tpu.data.transforms import fitted_stream

        arrs = [np.ones((4, 4)), np.zeros((4, 4))]
        out = list(fitted_stream(arrs, (4, 4), mode="none"))
        assert all(o is a for o, a in zip(out, arrs))


class TestRandAffine:
    """Random affine augmentation (reference RandAffined,
    tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:115-123)."""

    def test_identity_params_exact(self):
        from generativemodels_tpu.data.transforms import rand_affine

        a = np.random.RandomState(0).rand(8, 8).astype(np.float32)
        out = rand_affine(a, np.random.default_rng(0), prob=1.0)
        np.testing.assert_allclose(out, a, atol=1e-6)

    def test_prob_zero_passthrough(self):
        from generativemodels_tpu.data.transforms import rand_affine

        a = np.random.RandomState(0).rand(8, 8).astype(np.float32)
        out = rand_affine(a, np.random.default_rng(0), rotate_range=1.0, prob=0.0)
        np.testing.assert_array_equal(out, a)

    def test_pure_translation_shifts_pixels(self):
        from generativemodels_tpu.data.transforms import rand_affine

        a = np.zeros((9, 9), np.float32)
        a[4, 4] = 1.0
        # translate_range with a degenerate (lo==hi) pair pins the shift
        out = rand_affine(a, np.random.default_rng(0),
                          translate_range=[(2.0, 2.0), (0.0, 0.0)], prob=1.0)
        assert out[6, 4] == pytest.approx(1.0, abs=1e-5)
        assert out[4, 4] == pytest.approx(0.0, abs=1e-5)

    def test_rotation_90_about_center(self):
        from generativemodels_tpu.data.transforms import rand_affine

        a = np.zeros((9, 9), np.float32)
        a[4, 7] = 1.0  # 3 px right of center
        half_pi = np.pi / 2
        out = rand_affine(a, np.random.default_rng(0),
                          rotate_range=[(half_pi, half_pi)], prob=1.0)
        # forward rot by +90deg, R=[[c,-s],[s,c]] on (row, col) offsets:
        # (0, +3) -> (-3, 0), i.e. 3 px above center
        assert out[1, 4] == pytest.approx(1.0, abs=1e-4)

    def test_channels_share_one_affine(self):
        from generativemodels_tpu.data.transforms import rand_affine

        a = np.random.RandomState(1).rand(6, 6).astype(np.float32)
        stacked = np.stack([a, a])  # (C=2, H, W)
        out = rand_affine(stacked, np.random.default_rng(3),
                          rotate_range=0.4, translate_range=1.0,
                          scale_range=0.1, prob=1.0, spatial_dims=2)
        assert out.shape == stacked.shape
        np.testing.assert_allclose(out[0], out[1], atol=1e-6)

    def test_3d_rotation_preserves_shape_and_mass(self):
        from generativemodels_tpu.data.transforms import rand_affine

        a = np.zeros((10, 10, 10), np.float32)
        a[3:7, 3:7, 3:7] = 1.0
        out = rand_affine(a, np.random.default_rng(0),
                          rotate_range=np.pi / 18, prob=1.0)
        assert out.shape == a.shape
        # small interior rotation nearly conserves total intensity
        assert float(out.sum()) == pytest.approx(float(a.sum()), rel=0.02)

    def test_stream_deterministic_per_seed(self):
        from generativemodels_tpu.data.transforms import augmented_stream

        arrs = [np.random.RandomState(i).rand(8, 8).astype(np.float32)
                for i in range(4)]
        kw = dict(rotate_range=0.2, translate_range=1.0, scale_range=0.05)
        o1 = list(augmented_stream(iter(arrs), seed=7, **kw))
        o2 = list(augmented_stream(iter(arrs), seed=7, **kw))
        o3 = list(augmented_stream(iter(arrs), seed=8, **kw))
        for x, y in zip(o1, o2):
            np.testing.assert_array_equal(x, y)
        assert any(not np.array_equal(x, y) for x, y in zip(o1, o3))

    def test_rand_spatial_crop(self):
        from generativemodels_tpu.data.transforms import rand_spatial_crop

        a = np.arange(12 * 10, dtype=np.float32).reshape(12, 10)
        rng = np.random.default_rng(0)
        outs = {rand_spatial_crop(a, rng, (4, 4)).tobytes() for _ in range(8)}
        out = rand_spatial_crop(a, rng, (4, 4))
        assert out.shape == (4, 4)
        assert len(outs) > 1  # position actually varies
        # every crop is a contiguous window of the source
        assert np.isin(out, a).all()

    def test_rand_affine_rejects_bad_rank(self):
        from generativemodels_tpu.data.transforms import rand_affine

        with pytest.raises(ValueError):
            rand_affine(np.zeros(5, np.float32), np.random.default_rng(0))


class TestCachedDataset:
    """RAM-cached epochs (reference CacheDataset,
    tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:126)."""

    def test_source_consumed_once(self):
        from generativemodels_tpu.data import cached_dataset

        pulls = []

        def source():
            for i in range(4):
                pulls.append(i)
                yield np.full((2, 2), i, np.float32)

        it = cached_dataset(source(), shuffle=False)
        first = [int(next(it)[0, 0]) for _ in range(12)]  # 3 epochs
        assert pulls == [0, 1, 2, 3]  # decoded exactly once
        assert first == [0, 1, 2, 3] * 3

    def test_reshuffles_per_epoch_deterministically(self):
        from generativemodels_tpu.data import cached_dataset

        arrs = [np.full((1,), i, np.float32) for i in range(8)]
        def epochs(seed):
            it = cached_dataset(iter(arrs), shuffle=True, seed=seed)
            return [[int(next(it)[0]) for _ in range(8)] for _ in range(3)]

        e = epochs(3)
        assert all(sorted(ep) == list(range(8)) for ep in e)
        assert e[0] != e[1] or e[1] != e[2]  # order changes across epochs
        assert epochs(3) == e  # and is reproducible per seed

    def test_max_bytes_guard(self):
        from generativemodels_tpu.data import cached_dataset

        src = (np.zeros((64, 64), np.float32) for _ in range(4))
        with pytest.raises(MemoryError):
            next(cached_dataset(src, max_bytes=3 * 64 * 64 * 4))

    def test_loop_false_single_epoch(self):
        from generativemodels_tpu.data import cached_dataset

        out = list(cached_dataset(iter([np.ones(2)] * 3), shuffle=False, loop=False))
        assert len(out) == 3

    def test_empty_source_raises(self):
        from generativemodels_tpu.data import cached_dataset

        with pytest.raises(ValueError):
            next(cached_dataset(iter([])))

    def test_training_stream_cache_and_augment(self, tmp_path):
        from generativemodels_tpu.data import training_stream

        for i in range(3):
            np.save(tmp_path / f"v{i}.npy",
                    np.random.RandomState(i).rand(10, 12).astype(np.float32))
        it = training_stream(str(tmp_path), (8, 8), cache=True, augment=True)
        got = [next(it) for _ in range(6)]
        assert all(g.shape == (8, 8) for g in got)
        assert all(np.isfinite(g).all() for g in got)


class TestReviewFindings:
    """Regressions from the round-3 code review."""

    def test_stale_library_triggers_rebuild(self, monkeypatch):
        """A previously-built .so missing newer symbols rebuilds once
        instead of leaking AttributeError (native.py load_library)."""
        from generativemodels_tpu.data import native

        monkeypatch.setattr(native, "_lib", None)
        calls = {"build": 0, "bind": 0}
        real_bind = native._bind_symbols

        def fake_bind(lib):
            calls["bind"] += 1
            if calls["bind"] == 1:
                raise AttributeError("undefined symbol: gmtpu_read_image")
            return real_bind(lib)

        monkeypatch.setattr(native, "_bind_symbols", fake_bind)
        monkeypatch.setattr(
            native, "_build_library",
            lambda: calls.__setitem__("build", calls["build"] + 1),
        )
        lib = native.load_library()
        assert lib is not None
        assert calls["build"] == 1 and calls["bind"] == 2

    def test_rgb_png_channel_first_fitting(self, tmp_path):
        """(H, W, 3) decoder output fits spatially, not across channels."""
        from PIL import Image

        from generativemodels_tpu.data import training_stream

        rng = np.random.RandomState(0)
        for i in range(2):
            Image.fromarray(rng.randint(0, 256, (20, 24, 3), np.uint8)).save(
                tmp_path / f"rgb{i}.png"
            )
        it = training_stream(str(tmp_path), (16, 16), augment=True)
        a = next(it)
        assert a.shape == (3, 16, 16)

    def test_ensure_channel_first(self):
        from generativemodels_tpu.data.transforms import ensure_channel_first

        assert ensure_channel_first(np.zeros((20, 24, 3)), 2).shape == (3, 20, 24)
        assert ensure_channel_first(np.zeros((20, 24)), 2).shape == (20, 24)
        # already channel-first: unchanged
        assert ensure_channel_first(np.zeros((3, 20, 24)), 2).shape == (3, 20, 24)
        # 3D volume with nd=3: no channel axis, unchanged
        assert ensure_channel_first(np.zeros((8, 9, 10)), 3).shape == (8, 9, 10)

    def test_all_unreadable_dir_raises_not_spins(self, tmp_path):
        """Every file failing to decode ends the stream with IOError
        instead of looping forever (pipeline + C++ worker guard)."""
        for i in range(3):
            (tmp_path / f"bad{i}.nii").write_bytes(b"not a nifti at all")
        from generativemodels_tpu.data import file_dataset

        with pytest.raises(IOError):
            for _ in file_dataset(str(tmp_path), loop=True):
                pass

    def test_decompose_3d_override_rejects_bad_geometry(self):
        from generativemodels_tpu.networks.blocks.convolutions import ConvND

        import jax
        import jax.numpy as jnp

        conv = ConvND(spatial_dims=2, features=4, kernel_size=(3, 3),
                      decompose_3d=True)
        with pytest.raises(ValueError):
            conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))


class TestPairedStream:
    """Aligned (image, label) pairs (data/pipeline.paired_stream)."""

    def _dirs(self, tmp_path, n=4):
        img_d, lab_d = tmp_path / "img", tmp_path / "lab"
        img_d.mkdir(); lab_d.mkdir()
        for i in range(n):
            np.save(img_d / f"s{i}.npy",
                    np.full((20, 24), float(i), np.float32))
            np.save(lab_d / f"s{i}.npy",
                    np.full((10, 12), float(i), np.float32))  # labels = index
        return str(img_d), str(lab_d)

    def test_pairs_stay_aligned_across_epochs(self, tmp_path):
        from generativemodels_tpu.data import paired_stream

        img_d, lab_d = self._dirs(tmp_path)
        it = paired_stream(img_d, lab_d, (16, 16), seed=3)
        for _ in range(10):  # crosses the epoch boundary (4 files)
            img, lab = next(it)
            assert img.shape == (16, 16) and lab.shape == (16, 16)
            # label map keeps its raw integer value = its image's index
            assert float(lab.max()) == float(np.round(lab.max()))
            # image i is constant i -> rescaled to 0; label center still i
            assert lab[8, 8] == lab.max()

    def test_label_values_not_rescaled(self, tmp_path):
        from generativemodels_tpu.data import paired_stream

        img_d, lab_d = self._dirs(tmp_path)
        it = paired_stream(img_d, lab_d, (16, 16), seed=0, loop=False)
        vals = sorted(float(lab[8, 8]) for _, lab in it)
        assert vals == [0.0, 1.0, 2.0, 3.0]

    def test_png_label_values_not_rescaled(self, tmp_path):
        """PNG label maps keep raw class ids — the image decoders'
        bit-depth rescale (uint8 -> /255) must NOT apply to labels, or
        {0,1,2} one-hots to all-background."""
        from PIL import Image

        from generativemodels_tpu.data import paired_stream

        img_d, lab_d = tmp_path / "img", tmp_path / "lab"
        img_d.mkdir(), lab_d.mkdir()
        for i in range(3):
            Image.fromarray(
                np.full((16, 16), 60 * i, np.uint8)
            ).save(img_d / f"s_{i}.png")
            Image.fromarray(
                np.full((16, 16), i, np.uint8)
            ).save(lab_d / f"s_{i}.png")
        it = paired_stream(str(img_d), str(lab_d), (16, 16), seed=0, loop=False)
        pairs = list(it)
        vals = sorted(float(lab[8, 8]) for _, lab in pairs)
        assert vals == [0.0, 1.0, 2.0]  # raw ids, not i/255
        assert all(float(img.max()) <= 1.0 for img, _ in pairs)

    def test_paired_stream_fit_none(self, tmp_path):
        """--fit none passes pairs through untouched (original shapes,
        no intensity rescale) instead of raising on the missing mode."""
        from generativemodels_tpu.data import paired_stream

        img_d, lab_d = self._dirs(tmp_path)
        img, lab = next(paired_stream(img_d, lab_d, (16, 16), fit="none"))
        assert img.shape == (20, 24) and lab.shape == (10, 12)

    def test_count_mismatch_raises(self, tmp_path):
        from generativemodels_tpu.data import paired_stream

        img_d, lab_d = self._dirs(tmp_path)
        np.save(tmp_path / "lab" / "extra.npy", np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError):
            next(paired_stream(img_d, lab_d, (16, 16)))

    def test_batched_pairs(self, tmp_path):
        from generativemodels_tpu.data import batched_pairs, paired_stream

        img_d, lab_d = self._dirs(tmp_path)
        imgs, labs = next(batched_pairs(
            paired_stream(img_d, lab_d, (16, 16)), 4))
        assert imgs.shape == (4, 16, 16) and labs.shape == (4, 16, 16)
