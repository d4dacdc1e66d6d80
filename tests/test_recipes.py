"""Tests for the ControlNet / SPADE / image-to-image training recipes.

Mirrors the reference tutorial mechanics these recipes rebuild:
tutorials/generative/2d_controlnet/2d_controlnet.py (frozen UNet + trained
CN), 2d_spade_ldm/2d_spade_ldm.py (SPADE AEKL + SPADE latent UNet),
2d_spade_gan/2d_spade_vae.py (SPADENet VAE-GAN), and
image_to_image_translation/tutorial_segmentation_with_ddpm.py (concat-
conditioned mask diffusion + sampling ensemble).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from generativemodels_tpu.networks.nets import (
    ControlNet,
    DiffusionModelUNet,
    MultiScalePatchDiscriminator,
    SPADENet,
    copy_weights_to_controlnet,
)
from generativemodels_tpu.networks.schedulers import DDPMScheduler
from generativemodels_tpu.parallel import init_train_state
from generativemodels_tpu.recipes import (
    SPADEVAEState,
    make_controlnet_train_step,
    make_segmentation_train_step,
    make_spade_vae_step,
    one_hot_labels,
    segment_with_uncertainty,
    synthetic_masked_batch,
    synthetic_seg_batch,
)

UNET_KWARGS = dict(
    spatial_dims=2, in_channels=1, num_res_blocks=1, num_channels=(8, 8),
    attention_levels=(False, False), norm_num_groups=8, num_head_channels=8,
)


class TestControlNetRecipe:
    def test_masked_batch(self):
        images, masks = synthetic_masked_batch(jax.random.PRNGKey(0), 2, 16)
        assert images.shape == masks.shape == (2, 1, 16, 16)
        assert set(np.unique(np.asarray(masks))) <= {0.0, 1.0}

    def test_train_step_updates_cn_only(self):
        model = DiffusionModelUNet(out_channels=1, **UNET_KWARGS)
        cn = ControlNet(conditioning_embedding_num_channels=(8,), **UNET_KWARGS)
        x0 = jnp.zeros((2, 1, 16, 16))
        t0 = jnp.zeros((2,), jnp.int32)
        unet_params = model.init(jax.random.PRNGKey(0), x0, t0)["params"]
        cn_params = copy_weights_to_controlnet(
            cn.init(jax.random.PRNGKey(1), x0, t0, x0)["params"], unet_params,
            verbose=False,
        )
        # seeded subtrees match the UNet exactly (reference load_state_dict :136)
        np.testing.assert_array_equal(
            cn_params["conv_in"]["kernel"],
            unet_params["conv_in"]["kernel"],
        )

        scheduler = DDPMScheduler(num_train_timesteps=10)
        tx = optax.adam(1e-3)

        # brief UNet pretrain: a fresh UNet's zero-init out_conv blocks all
        # gradient, exactly like the reference (the tutorial trains the DM
        # first, 2d_controlnet.py:215-290)
        from generativemodels_tpu.parallel import make_diffusion_train_step

        pre_tx = optax.adam(1e-2)
        pre_step = make_diffusion_train_step(
            lambda p, x, t: model.apply({"params": p}, x, t), scheduler, pre_tx,
            donate=False,
        )
        pre_state = init_train_state(unet_params, pre_tx)
        images, masks = synthetic_masked_batch(jax.random.PRNGKey(2), 2, 16)
        for i in range(2):
            pre_state, _ = pre_step(pre_state, images, jax.random.PRNGKey(10 + i))
        unet_params = pre_state.params

        def frozen_unet_apply(noisy, t, down_res, mid_res):
            return model.apply(
                {"params": unet_params}, noisy, t,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
            )

        def cn_apply(p, noisy, t, masks):
            return cn.apply({"params": p}, noisy, t, controlnet_cond=masks)

        step = make_controlnet_train_step(frozen_unet_apply, cn_apply, scheduler, tx)
        state = init_train_state(cn_params, tx)
        losses = []
        for i in range(3):
            state, loss = step(state, images, masks, jax.random.PRNGKey(3 + i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        # the ControlNet actually trains
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, cn_params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0


class TestSPADERecipes:
    def test_one_hot_labels(self):
        labels = jnp.array([[[[0, 1], [2, 1]]]])  # (1, 1, 2, 2)
        onehot = one_hot_labels(labels, 3)
        assert onehot.shape == (1, 3, 2, 2)
        np.testing.assert_array_equal(onehot.sum(axis=1), np.ones((1, 2, 2)))
        assert float(onehot[0, 2, 1, 0]) == 1.0

    def test_synthetic_seg_batch(self):
        images, seg = synthetic_seg_batch(jax.random.PRNGKey(0), 2, 16, 3)
        assert images.shape == (2, 1, 16, 16)
        assert seg.shape == (2, 3, 16, 16)
        np.testing.assert_allclose(np.asarray(seg.sum(axis=1)), 1.0)

    def test_spade_vae_step(self):
        net = SPADENet(
            spatial_dims=2, in_channels=1, out_channels=1, label_nc=3,
            input_shape=(16, 16), num_channels=(4, 8), z_dim=8, is_vae=True,
        )
        disc = MultiScalePatchDiscriminator(
            num_d=2, num_layers_d=2, spatial_dims=2, num_channels=4,
            in_channels=4, norm="INSTANCE", minimum_size_im=16,
            pooling_method="AVG",
        )
        x0 = jnp.zeros((2, 1, 16, 16))
        seg0 = jnp.zeros((2, 3, 16, 16))
        g_vars = net.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            seg0, x0,
        )
        d_vars = disc.init(jax.random.PRNGKey(2), jnp.concatenate([x0, seg0], 1))
        g_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
        state = SPADEVAEState(
            g_params=g_vars["params"], g_opt_state=g_tx.init(g_vars["params"]),
            d_params=d_vars["params"], d_opt_state=d_tx.init(d_vars["params"]),
            step=jnp.asarray(0),
        )
        step = make_spade_vae_step(net, disc, g_tx, d_tx)
        images, seg = synthetic_seg_batch(jax.random.PRNGKey(3), 2, 16, 3)
        state, out = step(state, images, seg, jax.random.PRNGKey(4))
        for k in ("g_total", "d_total", "kld", "feature_matching_loss"):
            assert np.isfinite(float(out[k])), k
        assert int(state.step) == 1


class TestSegmentationDDPM:
    def test_train_and_ensemble(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=2, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False),
            norm_num_groups=8, num_head_channels=8,
        )
        scheduler = DDPMScheduler(num_train_timesteps=10)
        tx = optax.adam(1e-3)
        x0 = jnp.zeros((2, 2, 16, 16))
        variables = model.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32)
        )
        apply = lambda p, x, t: model.apply({"params": p}, x, t)
        step = make_segmentation_train_step(apply, scheduler, tx)
        state = init_train_state(variables["params"], tx)
        images, masks = synthetic_masked_batch(jax.random.PRNGKey(1), 2, 16)
        state, loss = step(state, images, masks, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))

        fn = lambda x, t, context=None: model.apply({"params": state.params}, x, t)
        mean, std = segment_with_uncertainty(
            images, fn, scheduler, jax.random.PRNGKey(3), ensemble=2
        )
        assert mean.shape == std.shape == (2, 1, 16, 16)
        assert bool(jnp.isfinite(mean).all()) and bool(jnp.isfinite(std).all())
        assert float(std.mean()) > 0  # distinct ensemble members


class TestEvalQuality:
    def test_ms_ssim_weights_for(self):
        from generativemodels_tpu.recipes import ms_ssim_weights_for

        assert len(ms_ssim_weights_for(64)) == 3  # 64 -> 32 -> 16 (>= 11)
        assert len(ms_ssim_weights_for(256)) == 5
        assert sum(ms_ssim_weights_for(64)) == pytest.approx(1.0)

    def test_evaluate_quality_on_synthetic_sets(self):
        from generativemodels_tpu.recipes import evaluate_quality
        from generativemodels_tpu.recipes.train_2d_ddpm import synthetic_batch

        real = synthetic_batch(jax.random.PRNGKey(0), 8, 32)
        close = real + 0.01 * jax.random.normal(jax.random.PRNGKey(1), real.shape)
        far = jax.random.uniform(jax.random.PRNGKey(2), real.shape)
        m_close = evaluate_quality(real, close)
        m_far = evaluate_quality(real, far)
        assert np.isfinite(m_close["fid"]) and np.isfinite(m_far["fid"])
        # the metric must order near-identical above noise
        assert m_close["fid"] < m_far["fid"]
        assert 0 <= m_close["ms_ssim_diversity"] <= 1


@pytest.mark.slow
class TestRecipeMains:
    """End-to-end recipe smoke runs at tiny scale (CPU)."""

    def _run(self, module, argv):
        import sys
        from unittest import mock

        with mock.patch.object(sys, "argv", ["prog"] + argv):
            module.main()

    def test_train_controlnet_main(self):
        from generativemodels_tpu.recipes import train_controlnet

        self._run(train_controlnet, [
            "--pretrain-steps", "2", "--steps", "2", "--batch", "2",
            "--size", "16", "--channels", "8", "8", "--norm-groups", "8",
        ])

    def test_train_spade_ldm_main(self):
        from generativemodels_tpu.recipes import train_spade_ldm

        self._run(train_spade_ldm, [
            "--stage1-steps", "2", "--stage2-steps", "2", "--warmup-steps", "1",
            "--batch", "2", "--size", "16", "--sample",
        ])

    def test_train_spade_vae_main(self):
        from generativemodels_tpu.recipes import train_spade_vae

        self._run(train_spade_vae, [
            "--steps", "2", "--batch", "2", "--size", "16",
        ])

    def test_segmentation_ddpm_main(self):
        from generativemodels_tpu.recipes import segmentation_ddpm

        self._run(segmentation_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16", "--ensemble", "2",
        ])

    def test_eval_quality_main(self, tmp_path):
        import json

        from generativemodels_tpu.recipes import eval_quality

        out = tmp_path / "quality.json"
        self._run(eval_quality, [
            "--train-steps", "2", "--batch", "4", "--size", "32",
            "--channels", "8", "8", "--norm-groups", "8",
            "--sample-count", "4", "--sample-batch", "4", "--ddim-steps", "2",
            "--out", str(out),
        ])
        result = json.loads(out.read_text())
        assert np.isfinite(result["fid"])
        assert -1.0 <= result["ms_ssim_diversity"] <= 1.0
        assert result["sample_count"] == 4



    def test_compare_schedulers_main(self, tmp_path):
        from generativemodels_tpu.recipes import compare_schedulers

        out = str(tmp_path / "cmp.json")
        self._run(compare_schedulers, [
            "--train-steps", "2", "--batch", "2", "--size", "16",
            "--sample-batch", "2", "--step-counts", "5",
            "--channels", "8", "8", "--norm-groups", "8", "--out", out,
        ])
        import json
        recs = json.load(open(out))
        # DDPM-1000 reference + 4 schedulers at 5 steps
        assert len(recs) == 5
        assert {r["scheduler"] for r in recs} == {"DDPM", "DDIM", "PNDM", "DPM-Solver++"}

    def test_train_2d_ddpm_v_prediction_main(self):
        from generativemodels_tpu.recipes import train_2d_ddpm

        self._run(train_2d_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--prediction-type", "v_prediction",
        ])


class TestEvalQualityUnits:
    def test_ms_ssim_weights_truncation(self):
        from generativemodels_tpu.recipes.eval_quality import ms_ssim_weights_for

        # 32px: 32 -> 16 (>=11) -> 8 (<11): 2 scales
        w32 = ms_ssim_weights_for(32)
        assert len(w32) == 2 and abs(sum(w32) - 1.0) < 1e-6
        # 64px: 64 -> 32 -> 16 -> 8: 3 scales
        assert len(ms_ssim_weights_for(64)) == 3
        # 256px+: all 5 Wang scales
        assert len(ms_ssim_weights_for(512)) == 5

    def test_evaluate_quality_separates_distributions(self):
        """FID(real, shifted) must exceed FID(real, real-like)."""
        from generativemodels_tpu.recipes.eval_quality import evaluate_quality

        key = jax.random.PRNGKey(0)
        a = jax.random.uniform(key, (8, 1, 32, 32))
        b = jax.random.uniform(jax.random.PRNGKey(1), (8, 1, 32, 32))
        near = evaluate_quality(a, b)
        far = evaluate_quality(a, jnp.clip(b + 0.7, 0, 1))
        assert far["fid"] > near["fid"]


class TestRecipeMains3D:
    """The four 3D tutorial families (VERDICT round 2 item 2) at tiny scale.

    Reference surfaces: tutorials/generative/3d_ddpm/3d_ddpm_tutorial.py,
    3d_ldm/3d_ldm_tutorial.py, 3d_autoencoderkl/, 3d_vqvae/.
    """

    def _run(self, module, argv):
        import sys
        from unittest import mock

        with mock.patch.object(sys, "argv", ["prog"] + argv):
            return module.main()

    def test_train_3d_ddpm_main(self):
        from generativemodels_tpu.recipes import train_3d_ddpm

        self._run(train_3d_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--head-channels", "8", "--dtype", "f32",
            "--sample", "--sample-steps", "2",
        ])

    def test_train_3d_ddpm_decomposed_convs(self, monkeypatch):
        """The recipe runs with the depth-decomposed conv lowering forced
        (the path the TPU takes by default)."""
        from generativemodels_tpu.recipes import train_3d_ddpm

        monkeypatch.setenv("GMTPU_DECOMPOSE_3D", "always")
        self._run(train_3d_ddpm, [
            "--steps", "1", "--batch", "1", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--head-channels", "8", "--dtype", "f32", "--no-remat",
        ])

    def test_train_3d_ddpm_nifti_data_dir(self, tmp_path):
        """--data-dir streams .npy volumes through the data pipeline."""
        import numpy as np

        from generativemodels_tpu.recipes import train_3d_ddpm

        for i in range(4):
            np.save(tmp_path / f"vol_{i}.npy",
                    np.random.RandomState(i).rand(16, 16, 16).astype(np.float32))
        self._run(train_3d_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--head-channels", "8", "--dtype", "f32",
            "--data-dir", str(tmp_path),
        ])

    def test_train_3d_ldm_main(self):
        from generativemodels_tpu.recipes import train_3d_ldm

        self._run(train_3d_ldm, [
            "--stage1-steps", "2", "--stage2-steps", "2", "--warmup-steps", "1",
            "--batch", "2", "--size", "16", "--sample", "--sample-steps", "2",
        ])

    def test_train_3d_ldm_stage1_only_is_autoencoderkl_tutorial(self):
        from generativemodels_tpu.recipes import train_3d_ldm

        state = self._run(train_3d_ldm, [
            "--stage1-steps", "2", "--stage2-steps", "0", "--warmup-steps", "1",
            "--batch", "1", "--size", "16",
        ])
        assert int(state.step) == 2

    def test_train_vqgan_3d_recon_only(self):
        """--spatial-dims 3 --adv-weight 0 = the 3d_vqvae tutorial family."""
        from generativemodels_tpu.recipes import train_vqgan

        self._run(train_vqgan, [
            "--steps", "2", "--warmup-steps", "2", "--batch", "2",
            "--size", "16", "--spatial-dims", "3", "--channels", "8", "8",
            "--adv-weight", "0",
        ])


class TestQualityPresets:
    """Pre-registered BASELINE quality evals (VERDICT round-2 item 5)."""

    def test_eval_quality_preset_pins_tutorial_config(self):
        from generativemodels_tpu.recipes.eval_quality import PRESETS

        p = PRESETS["mednist_2d_ddpm"]
        # exact reference tutorial values (2d_ddpm_tutorial.py:127-201)
        assert p["channels"] == [128, 256, 256]
        assert p["batch"] == 128 and p["lr"] == 2.5e-5
        assert p["sample_count"] == 1000

    def test_eval_quality_preset_overridable(self, tmp_path):
        import json
        import sys
        from unittest import mock

        from generativemodels_tpu.recipes import eval_quality

        out = tmp_path / "q.json"
        argv = ["prog", "--preset", "mednist_2d_ddpm",
                "--train-steps", "2", "--batch", "4", "--size", "32",
                "--channels", "8", "8", "--norm-groups", "8",
                "--sample-count", "4", "--sample-batch", "4",
                "--ddim-steps", "2", "--out", str(out)]
        with mock.patch.object(sys, "argv", argv):
            eval_quality.main()
        result = json.loads(out.read_text())
        assert result["preset"] == "mednist_2d_ddpm"
        assert np.isfinite(result["fid"])

    def test_eval_brain_ldm_tiny(self, tmp_path):
        import json

        from generativemodels_tpu.recipes import eval_brain_ldm

        out = tmp_path / "brain.json"
        result = eval_brain_ldm.main([
            "--tiny", "--sample-count", "4", "--same-cond-pairs", "1",
            "--ddim-steps", "2", "--dtype", "f32", "--out", str(out),
        ])
        assert result["plumbing_only"] is True
        assert result["published_reference"]["msssim"] == 0.6555
        assert -1.0 <= result["msssim"] <= 1.0
        assert -1.0 <= result["msssim_4g"] <= 1.0
        assert json.loads(out.read_text())["preset"].startswith("brain_3d_ldm")


class TestDataFitting:
    """--fit: real-size samples stream into fixed-shape jitted steps
    (reference route: MONAI ScaleIntensity + CenterSpatialCrop/Resize,
    tutorials/generative/3d_ddpm/3d_ddpm_tutorial.py)."""

    def _run(self, module, argv):
        import sys
        from unittest import mock

        with mock.patch.object(sys, "argv", ["prog"] + argv):
            module.main()

    def test_train_3d_ddpm_fits_brats_like_volumes(self, tmp_path):
        import numpy as np

        from generativemodels_tpu.recipes import train_3d_ddpm

        # volumes deliberately NOT matching --size (like BraTS 240x240x155)
        for i in range(2):
            np.save(tmp_path / f"vol_{i}.npy",
                    np.random.RandomState(i).rand(20, 24, 11).astype(np.float32))
        self._run(train_3d_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--head-channels", "8", "--dtype", "f32",
            "--data-dir", str(tmp_path),
        ])

    def test_train_2d_ddpm_resize_fit(self, tmp_path):
        import numpy as np
        from PIL import Image

        from generativemodels_tpu.recipes import train_2d_ddpm

        for i in range(2):
            Image.fromarray(
                np.random.RandomState(i).randint(0, 256, (28, 28), np.uint8)
            ).save(tmp_path / f"i{i}.png")
        self._run(train_2d_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--fit", "resize", "--data-dir", str(tmp_path),
        ])

    def test_train_2d_ddpm_augmented(self, tmp_path):
        import numpy as np
        from PIL import Image

        from generativemodels_tpu.recipes import train_2d_ddpm

        for i in range(2):
            Image.fromarray(
                np.random.RandomState(i).randint(0, 256, (16, 16), np.uint8)
            ).save(tmp_path / f"i{i}.png")
        self._run(train_2d_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--augment", "--data-dir", str(tmp_path),
        ])

    def test_train_2d_ddpm_cached(self, tmp_path):
        import numpy as np

        from generativemodels_tpu.recipes import train_2d_ddpm

        for i in range(3):
            np.save(tmp_path / f"s{i}.npy",
                    np.random.RandomState(i).rand(16, 16).astype(np.float32))
        self._run(train_2d_ddpm, [
            "--steps", "3", "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--cache", "--augment", "--data-dir", str(tmp_path),
        ])

    def test_eval_quality_fits_real_size_images(self, tmp_path):
        """--data-dir images of a different size are fitted and given a
        channel axis before the jitted train step (round-3 regression)."""
        import json
        import sys
        from unittest import mock

        import numpy as np
        from PIL import Image

        from generativemodels_tpu.recipes import eval_quality

        data = tmp_path / "imgs"
        data.mkdir()
        for i in range(4):
            Image.fromarray(
                np.random.RandomState(i).randint(0, 256, (28, 24), np.uint8)
            ).save(data / f"i{i}.png")
        out = tmp_path / "q.json"
        argv = ["prog", "--train-steps", "2", "--batch", "2", "--size", "16",
                "--channels", "8", "8", "--norm-groups", "8",
                "--sample-count", "2", "--sample-batch", "2",
                "--ddim-steps", "2", "--data-dir", str(data), "--out", str(out)]
        with mock.patch.object(sys, "argv", argv):
            eval_quality.main()
        result = json.loads(out.read_text())
        assert np.isfinite(result["fid"]) and result["data"] == str(data)


class TestDataDirRecipes:
    """--data-dir on the LDM / VQVAE-transformer / ControlNet recipes."""

    def _pngs(self, tmp_path, n=3, shape=(20, 24)):
        import numpy as np
        from PIL import Image

        for i in range(n):
            Image.fromarray(
                np.random.RandomState(i).randint(0, 256, shape, np.uint8)
            ).save(tmp_path / f"i{i}.png")
        return str(tmp_path)

    def _run(self, module, argv):
        import sys
        from unittest import mock

        with mock.patch.object(sys, "argv", ["prog"] + argv):
            module.main()

    def test_train_2d_ldm_data_dir(self, tmp_path):
        from generativemodels_tpu.recipes import train_2d_ldm

        self._run(train_2d_ldm, [
            "--stage1-steps", "2", "--stage2-steps", "2", "--warmup-steps", "1",
            "--batch", "2", "--size", "16",
            "--data-dir", self._pngs(tmp_path), "--cache",
        ])

    def test_train_vqvae_transformer_data_dir(self, tmp_path):
        from generativemodels_tpu.recipes import train_vqvae_transformer

        self._run(train_vqvae_transformer, [
            "--stage1-steps", "2", "--stage2-steps", "2",
            "--batch", "2", "--size", "16", "--num-embeddings", "8",
            "--data-dir", self._pngs(tmp_path),
        ])

    def test_train_controlnet_data_dir(self, tmp_path):
        from generativemodels_tpu.recipes import train_controlnet

        self._run(train_controlnet, [
            "--pretrain-steps", "2", "--steps", "2",
            "--batch", "2", "--size", "16",
            "--channels", "8", "8", "--norm-groups", "8",
            "--data-dir", self._pngs(tmp_path), "--augment",
        ])

    def _paired_dirs(self, tmp_path, n=4, nc=3):
        import numpy as np

        img_d, lab_d = tmp_path / "img", tmp_path / "lab"
        img_d.mkdir(); lab_d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(n):
            np.save(img_d / f"s{i}.npy", rng.rand(20, 24).astype(np.float32))
            np.save(lab_d / f"s{i}.npy",
                    rng.randint(0, nc, (20, 24)).astype(np.float32))
        return str(img_d), str(lab_d)

    def test_train_spade_ldm_paired_data(self, tmp_path):
        from generativemodels_tpu.recipes import train_spade_ldm

        img_d, lab_d = self._paired_dirs(tmp_path)
        self._run(train_spade_ldm, [
            "--stage1-steps", "2", "--stage2-steps", "2", "--warmup-steps", "1",
            "--batch", "2", "--size", "16", "--label-nc", "3",
            "--data-dir", img_d, "--label-dir", lab_d,
        ])

    def test_segmentation_ddpm_paired_data(self, tmp_path):
        from generativemodels_tpu.recipes import segmentation_ddpm

        img_d, lab_d = self._paired_dirs(tmp_path, nc=2)
        self._run(segmentation_ddpm, [
            "--steps", "2", "--batch", "2", "--size", "16",
            "--data-dir", img_d, "--label-dir", lab_d,
        ])

    def test_paired_dirs_required_together(self, tmp_path):
        import pytest as _pytest

        from generativemodels_tpu.recipes import segmentation_ddpm

        with _pytest.raises(SystemExit):
            self._run(segmentation_ddpm, [
                "--steps", "1", "--data-dir", str(tmp_path),
            ])


class TestServeRecipe:
    """Serving: AOT-compiled DDIM sampler behind the HTTP API (recipes/
    serve.py) — the deployment surface replacing the reference zoo
    bundles' scripts/sampler.py + TorchScript export story."""

    def _tiny_sampler(self, batch=2):
        from generativemodels_tpu.recipes.serve import build_sampler

        return build_sampler(
            spatial_dims=2, size=16, channels=(8, 8), norm_groups=8,
            batch=batch, ddim_steps=3,
        )

    def test_http_roundtrip(self):
        import base64
        import io
        import json
        import urllib.request

        from generativemodels_tpu.recipes.serve import _SamplerState, start_server

        fn, shape = self._tiny_sampler(batch=2)
        state = _SamplerState(jax.jit(fn), shape)
        httpd = start_server(state, port=0)
        try:
            base = f"http://127.0.0.1:{httpd.server_port}"
            with urllib.request.urlopen(base + "/healthz") as r:
                health = json.loads(r.read())
            assert health["status"] == "ok" and health["batch"] == 2

            req = urllib.request.Request(
                base + "/sample",
                data=json.dumps({"n": 3, "seed": 5}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                resp = json.loads(r.read())
            imgs = np.load(io.BytesIO(base64.b64decode(resp["data_b64"])))
            assert imgs.shape == (3, 1, 16, 16)  # 3 rounds up to 2 batches
            assert np.isfinite(imgs).all()

            bad = urllib.request.Request(
                base + "/sample", data=b'{"n": 0}', method="POST"
            )
            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(bad)
        finally:
            httpd.shutdown()

    def test_export_reload_matches_jit(self, tmp_path):
        from generativemodels_tpu.utils.export import load_exported, save_exported

        fn, _ = self._tiny_sampler(batch=1)
        path = str(tmp_path / "sampler.jaxexport")
        save_exported(path, fn, jnp.int32(0))
        reloaded = load_exported(path)
        a = np.asarray(jax.jit(fn)(jnp.int32(7)))
        b = np.asarray(reloaded(jnp.int32(7)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_serve_restores_checkpoint(self, tmp_path):
        """build_sampler(checkpoint_dir=...) serves the trained params,
        not the fresh init (fresh zero-init out conv ⇒ pure-noise DDIM
        trajectory; restored params must change the output)."""
        from generativemodels_tpu.recipes.serve import build_sampler
        from generativemodels_tpu.utils import CheckpointManager

        fn0, _ = self._tiny_sampler(batch=1)
        base = np.asarray(fn0(jnp.int32(3)))

        # fabricate a "trained" checkpoint: perturb the fresh params
        from generativemodels_tpu.networks.nets import DiffusionModelUNet

        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True),
            num_head_channels=8, norm_num_groups=8,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16)), jnp.zeros((1,), jnp.int32)
        )
        params = jax.tree.map(lambda p: p + 0.05, variables["params"])
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, {"params": params, "step": 1}, force=True)
        mgr.close()

        fn1, _ = build_sampler(
            spatial_dims=2, size=16, channels=(8, 8), norm_groups=8,
            batch=1, ddim_steps=3, checkpoint_dir=str(tmp_path / "ck"),
        )
        restored = np.asarray(fn1(jnp.int32(3)))
        assert not np.allclose(base, restored)
