"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; tests exercise sharding and
numerics on `--xla_force_host_platform_device_count=8` CPU devices, mirroring
how the reference tests run on CPU (reference tests/utils.py:459-462 uses a
gloo fallback for the same reason).

Note: the image's sitecustomize imports jax and registers the `axon` TPU
plugin at interpreter startup, so plain env vars are read too late; the
platform must be forced through jax.config instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated on CPU
# (single-core image), and the tiny test models are identical across runs.
_cache_dir = os.environ.get(
    "GMTPU_TEST_CACHE", os.path.expanduser("~/.cache/gmtpu_pytest_xla")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# cache everything: the suite's cost is hundreds of sub-second compiles
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# Heavyweight integration tests (>~15 s each on the 1-CPU image), centrally
# marked `slow` so `./runtests.sh --quick` stays a fast smoke gate while
# `./runtests.sh` (full) still runs everything. Durations measured with
# `pytest --durations` (round 2); update when tests are renamed.
_SLOW = {
    "test_aux.py::TestVQGANResume::test_exact_resume",
    "test_aux.py::TestBrainLDMSampler::test_conditioned_brain_sampling",
    "test_aux.py::TestSuperResolutionRecipe::test_prepare_and_sample",
    "test_aux.py::TestClassifierGuidance::test_guided_sampling",
    "test_aux.py::TestRecipes::test_guided_sampling",
    "test_aux.py::TestRecipes::test_inpaint_preserves_known_region_structure",
    "test_recipes.py::TestSPADERecipes::test_spade_vae_step",
    "test_recipes.py::TestControlNetRecipe::test_train_step_updates_cn_only",
    "test_recipes.py::TestEvalQuality::test_evaluate_quality_on_synthetic_sets",
    "test_recipes.py::TestEvalQualityUnits::test_evaluate_quality_separates_distributions",
    "test_recipes.py::TestSegmentationDDPM::test_train_and_ensemble",
    "test_recipes.py::TestRecipeMains::test_eval_quality_main",
    "test_schedulers.py::TestPNDM::test_full_loop_shapes[False]",
    "test_schedulers.py::TestPNDM::test_full_loop_shapes[True]",
    "test_schedulers.py::TestPNDM::test_trajectory_matches_reference[False]",
    "test_schedulers.py::TestPNDM::test_trajectory_matches_reference[True]",
    "test_perceptual.py::TestPerceptualLoss3D::test_medicalnet",
    "test_perceptual.py::TestPerceptualLoss2D::test_resnet50_backend",
    "test_perceptual.py::TestPerceptualLoss2D::test_identity_zero[squeeze]",
    "test_perceptual.py::TestPerceptualLoss2D::test_identity_zero[alex]",
    "test_diffusion_inferer.py::TestTrainStep::test_jitted_train_step_decreases_loss",
    "test_diffusion_inferer.py::TestLikelihood::test_scan_matches_loop",
    "test_diffusion_inferer.py::TestLikelihood::test_likelihood_intermediates",
    "test_parallel.py::TestMultiStepTrain::test_matches_sequential_single_steps",
    "test_parallel.py::TestDataParallel::test_dp_matches_single_device",
    "test_parallel.py::TestDataParallel::test_8_device_data_parallel_step",
    "test_parallel.py::TestSpatialSharding::test_data_space_mesh_step",
    "test_parallel.py::TestSyncBatchNorm::test_synced_stats_match_global_batch",
    "test_diffusion_model_unet.py::TestCheckpointedUNet::test_remat_matches_no_remat",
    "test_metrics.py::TestMSSSIMGoldenValues::test3d_gaussian",
    "test_stage1_models.py::TestVQVAE::test_3d_forward",
    "test_stage1_models.py::TestAutoencoderKL::test_stage2_api",
    "test_conditioning_models.py::TestSPADEDiffusionModelUNet::test_forward",
    "test_conditioning_models.py::TestSPADENet::test_vae_mode",
    "test_conditioning_models.py::TestSPADEAutoencoderKL::test_roundtrip",
    "test_conditioning_models.py::TestControlNet3D::test_3d_controlnet_feeds_3d_unet",
    "test_engines.py::TestFusedAdversarialStep::test_single_step_updates_both",
    "test_engines.py::TestBatchNormDiscriminatorState::test_batch_stats_update_through_fused_step",
    "test_latent_inferers.py::TestLatentDiffusionInferer::test_mismatched_latent_shapes",
    "test_latent_inferers.py::TestKVCacheSampling::test_cached_matches_windowed_greedy",
    "test_latent_inferers.py::TestControlNetInferers::test_latent_controlnet",
    "test_perceptual.py::TestPerceptualLoss2D::test_radimagenet_backend",
    "test_engines.py::TestVQGANStep::test_fused_step_updates_g_d_and_codebook",
    "test_engines.py::TestAdversarialTrainerIntegration::test_five_epoch_run",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.split("tests/")[-1]
        if nodeid in _SLOW:
            item.add_marker(pytest.mark.slow)
