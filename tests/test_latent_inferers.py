"""End-to-end tests for LatentDiffusionInferer, ControlNet inferers, and
VQVAETransformerInferer with tiny real models (T=10, CPU).

Mirrors reference tests/test_latent_diffusion_inferer.py,
test_controlnet_inferers.py, test_vqvaetransformer_inferer.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.inferers import (
    ControlNetDiffusionInferer,
    ControlNetLatentDiffusionInferer,
    LatentDiffusionInferer,
    VQVAETransformerInferer,
)
from generativemodels_tpu.networks.nets import (
    AutoencoderKL,
    ControlNet,
    DecoderOnlyTransformer,
    DiffusionModelUNet,
    VQVAE,
)
from generativemodels_tpu.networks.schedulers import DDPMScheduler
from generativemodels_tpu.utils import Ordering


@pytest.fixture(scope="module")
def aekl_bound():
    model = AutoencoderKL(
        spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(4, 4), attention_levels=(False, False), latent_channels=3,
        norm_num_groups=4, with_encoder_nonlocal_attn=False,
        with_decoder_nonlocal_attn=False,
    )
    x = jnp.zeros((2, 1, 16, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x
    )
    return model.bind(variables, rngs={"sampling": jax.random.PRNGKey(2)})


@pytest.fixture(scope="module")
def latent_unet():
    model = DiffusionModelUNet(
        spatial_dims=2, in_channels=3, out_channels=3, num_res_blocks=1,
        num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
    )
    x = jnp.zeros((2, 3, 8, 8))
    variables = model.init(jax.random.PRNGKey(3), x, jnp.array([0, 0]))

    def fn(x, timesteps, context=None, **kwargs):
        return model.apply(variables, x, timesteps, context=context, **kwargs)

    return fn


class TestLatentDiffusionInferer:
    def test_train_forward(self, aekl_bound, latent_unet):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        inputs = jnp.zeros((2, 1, 16, 16))
        noise = jnp.zeros((2, 3, 8, 8))
        pred = inferer(inputs, aekl_bound, latent_unet, noise, jnp.array([2, 5]))
        assert pred.shape == (2, 3, 8, 8)

    def test_sample_decodes_to_image_space(self, aekl_bound, latent_unet):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        img = inferer.sample(noise, aekl_bound, latent_unet, key=jax.random.PRNGKey(1))
        assert img.shape == (2, 1, 16, 16)

    def test_sample_with_dpmsolver(self, aekl_bound, latent_unet):
        """The fast solver is drop-in for latent diffusion (the main
        serving config: LDM + few-step solver)."""
        from generativemodels_tpu.networks.schedulers import DPMSolverMultistepScheduler

        scheduler = DPMSolverMultistepScheduler(num_train_timesteps=10)
        scheduler.set_timesteps(5)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        img = inferer.sample(noise, aekl_bound, latent_unet, key=jax.random.PRNGKey(1))
        assert img.shape == (2, 1, 16, 16)
        assert bool(jnp.isfinite(img).all())

    def test_sample_intermediates(self, aekl_bound, latent_unet):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        img, intermediates = inferer.sample(
            noise, aekl_bound, latent_unet, save_intermediates=True, intermediate_steps=5,
            key=jax.random.PRNGKey(1),
        )
        assert img.shape == (2, 1, 16, 16)
        assert all(i.shape == (2, 1, 16, 16) for i in intermediates)

    def test_likelihood(self, aekl_bound, latent_unet):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        ll = inferer.get_likelihood(inputs, aekl_bound, latent_unet, key=jax.random.PRNGKey(1))
        assert ll.shape == (2,)

    def test_mismatched_latent_shapes(self, aekl_bound):
        # UNet works on padded 12x12 latents; autoencoder produces 8x8
        unet = DiffusionModelUNet(
            spatial_dims=2, in_channels=3, out_channels=3, num_res_blocks=1,
            num_channels=(4, 4), attention_levels=(False, False), norm_num_groups=4,
            num_head_channels=4,
        )
        x = jnp.zeros((2, 3, 12, 12))
        variables = unet.init(jax.random.PRNGKey(3), x, jnp.array([0, 0]))
        fn = lambda x, t, context=None, **kw: unet.apply(variables, x, t, context=context, **kw)

        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = LatentDiffusionInferer(
            scheduler, scale_factor=1.0,
            ldm_latent_shape=[12, 12], autoencoder_latent_shape=[8, 8],
        )
        inputs = jnp.zeros((2, 1, 16, 16))
        noise = jnp.zeros((2, 3, 12, 12))
        pred = inferer(inputs, aekl_bound, fn, noise, jnp.array([2, 5]))
        assert pred.shape == (2, 3, 12, 12)
        img = inferer.sample(noise, aekl_bound, fn, key=jax.random.PRNGKey(1))
        assert img.shape == (2, 1, 16, 16)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            LatentDiffusionInferer(DDPMScheduler(10), ldm_latent_shape=[8, 8])


class TestControlNetInferers:
    @pytest.fixture(scope="class")
    def cn_fn(self):
        cn = ControlNet(
            spatial_dims=2, in_channels=1, num_res_blocks=1, num_channels=(8, 8),
            attention_levels=(False, False), norm_num_groups=8,
            conditioning_embedding_num_channels=(8,),
        )
        x = jnp.zeros((1, 1, 16, 16))
        variables = cn.init(jax.random.PRNGKey(0), x, jnp.array([0]), x)

        def fn(x, timesteps, controlnet_cond, context=None):
            return cn.apply(variables, x, timesteps, controlnet_cond, context=context)

        return fn

    @pytest.fixture(scope="class")
    def unet_fn(self):
        model = DiffusionModelUNet(
            spatial_dims=2, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, False), norm_num_groups=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        variables = model.init(jax.random.PRNGKey(1), x, jnp.array([0]))

        def fn(x, timesteps, context=None, **kwargs):
            return model.apply(variables, x, timesteps, context=context, **kwargs)

        return fn

    def test_train_forward(self, cn_fn, unet_fn):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = ControlNetDiffusionInferer(scheduler)
        inputs = jnp.zeros((1, 1, 16, 16))
        noise = jnp.zeros((1, 1, 16, 16))
        cn_cond = jnp.ones((1, 1, 16, 16))
        pred = inferer(inputs, unet_fn, cn_fn, noise, jnp.array([2]), cn_cond)
        assert pred.shape == inputs.shape

    def test_sample(self, cn_fn, unet_fn):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = ControlNetDiffusionInferer(scheduler)
        noise = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16))
        cn_cond = jnp.ones((1, 1, 16, 16))
        sample = inferer.sample(noise, unet_fn, cn_fn, cn_cond, key=jax.random.PRNGKey(1))
        assert sample.shape == noise.shape

    def test_likelihood(self, cn_fn, unet_fn):
        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = ControlNetDiffusionInferer(scheduler)
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 16, 16))
        cn_cond = jnp.ones((1, 1, 16, 16))
        ll = inferer.get_likelihood(inputs, unet_fn, cn_fn, cn_cond, key=jax.random.PRNGKey(1))
        assert ll.shape == (1,)

    def test_latent_controlnet(self, aekl_bound):
        cn = ControlNet(
            spatial_dims=2, in_channels=3, num_res_blocks=1, num_channels=(4, 4),
            attention_levels=(False, False), norm_num_groups=4, num_head_channels=4,
            conditioning_embedding_num_channels=(8,),
        )
        z = jnp.zeros((2, 3, 8, 8))
        cond_latent = jnp.zeros((2, 1, 8, 8))  # cn_cond has 1 channel
        cn_vars = cn.init(jax.random.PRNGKey(0), z, jnp.array([0, 0]), cond_latent)
        cn_fn = lambda x, t, controlnet_cond, context=None: cn.apply(
            cn_vars, x, t, controlnet_cond, context=context)

        unet = DiffusionModelUNet(
            spatial_dims=2, in_channels=3, out_channels=3, num_res_blocks=1,
            num_channels=(4, 4), attention_levels=(False, False), norm_num_groups=4,
            num_head_channels=4,
        )
        unet_vars = unet.init(jax.random.PRNGKey(1), z, jnp.array([0, 0]))
        unet_fn = lambda x, t, context=None, **kw: unet.apply(
            unet_vars, x, t, context=context, **kw)

        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = ControlNetLatentDiffusionInferer(scheduler, scale_factor=0.5)
        # cn_cond at image scale (16x16) is auto-resized to the 8x8 latent
        cn_cond = jnp.ones((2, 1, 16, 16))
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        img = inferer.sample(
            noise, aekl_bound, unet_fn, cn_fn, cn_cond, key=jax.random.PRNGKey(1)
        )
        assert img.shape == (2, 1, 16, 16)


class TestVQVAETransformerInferer:
    @pytest.fixture(scope="class")
    def stack(self):
        vqvae = VQVAE(
            spatial_dims=2, in_channels=1, out_channels=1, num_channels=(4, 4),
            num_res_layers=1, num_res_channels=(4, 4),
            downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
            upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
            num_embeddings=8, embedding_dim=4,
        )
        x = jnp.zeros((2, 1, 16, 16))
        vq_vars = vqvae.init(jax.random.PRNGKey(0), x)
        vq_bound = vqvae.bind(vq_vars)

        transformer = DecoderOnlyTransformer(
            num_tokens=8 + 1, max_seq_len=16, attn_layers_dim=8, attn_layers_depth=1,
            attn_layers_heads=2,
        )
        t_vars = transformer.init(jax.random.PRNGKey(1), jnp.zeros((2, 16), jnp.int32))
        t_bound = transformer.bind(t_vars)

        ordering = Ordering("raster_scan", 2, (1, 4, 4))
        return vq_bound, t_bound, ordering

    def test_train_forward(self, stack):
        vq, tr, ordering = stack
        inferer = VQVAETransformerInferer()
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        logits = inferer(inputs, vq, tr, ordering)
        assert logits.shape == (2, 16, 9)

    def test_return_latent(self, stack):
        vq, tr, ordering = stack
        inferer = VQVAETransformerInferer()
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        logits, target, spatial = inferer(inputs, vq, tr, ordering, return_latent=True)
        assert logits.shape == (2, 16, 9)
        assert target.shape == (2, 16)
        assert spatial == (4, 4)

    def test_cropped_training(self, stack):
        vq, _, ordering = stack
        transformer = DecoderOnlyTransformer(
            num_tokens=9, max_seq_len=8, attn_layers_dim=8, attn_layers_depth=1,
            attn_layers_heads=2,
        )
        t_vars = transformer.init(jax.random.PRNGKey(1), jnp.zeros((2, 8), jnp.int32))
        t_bound = transformer.bind(t_vars)
        inferer = VQVAETransformerInferer()
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        logits = inferer(inputs, vq, t_bound, ordering, key=jax.random.PRNGKey(5))
        assert logits.shape == (2, 8, 9)

    def test_sample(self, stack):
        vq, tr, ordering = stack
        inferer = VQVAETransformerInferer()
        starting = jnp.full((2, 1), 8)  # BOS = num_embeddings
        img = inferer.sample(
            (4, 4), starting, vq, tr, ordering, temperature=1.0,
            key=jax.random.PRNGKey(0),
        )
        assert img.shape == (2, 1, 16, 16)

    def test_sample_top_k(self, stack):
        vq, tr, ordering = stack
        inferer = VQVAETransformerInferer()
        starting = jnp.full((1, 1), 8)
        img = inferer.sample(
            (4, 4), starting, vq, tr, ordering, top_k=3, key=jax.random.PRNGKey(0)
        )
        assert img.shape == (1, 1, 16, 16)

    def test_likelihood_map(self, stack):
        vq, tr, ordering = stack
        inferer = VQVAETransformerInferer()
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        ll = inferer.get_likelihood(inputs, vq, tr, ordering)
        assert ll.shape == (2, 4, 4)
        assert bool((ll <= 0).all())  # log-probs

    def test_likelihood_windowed(self, stack):
        """seq_len (16) > max_seq_len (8) exercises the scan continuation."""
        vq, _, ordering = stack
        transformer = DecoderOnlyTransformer(
            num_tokens=9, max_seq_len=8, attn_layers_dim=8, attn_layers_depth=1,
            attn_layers_heads=2,
        )
        t_vars = transformer.init(jax.random.PRNGKey(1), jnp.zeros((2, 8), jnp.int32))
        t_bound = transformer.bind(t_vars)
        inferer = VQVAETransformerInferer()
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        ll = inferer.get_likelihood(inputs, vq, t_bound, ordering)
        assert ll.shape == (2, 4, 4)

    def test_likelihood_resampled(self, stack):
        vq, tr, ordering = stack
        inferer = VQVAETransformerInferer()
        inputs = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16))
        ll = inferer.get_likelihood(
            inputs, vq, tr, ordering, resample_latent_likelihoods=True
        )
        assert ll.shape == (2, 1, 16, 16)


class TestKVCacheSampling:
    def test_cached_matches_windowed_greedy(self, ):
        """KV-cache decoding must produce the same tokens as the full
        re-forward path (greedy top-1 to avoid sampling tie noise)."""
        vqvae = VQVAE(
            spatial_dims=2, in_channels=1, out_channels=1, num_channels=(4, 4),
            num_res_layers=1, num_res_channels=(4, 4),
            downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
            upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
            num_embeddings=8, embedding_dim=4,
        )
        x = jnp.zeros((1, 1, 16, 16))
        vq_vars = vqvae.init(jax.random.PRNGKey(0), x)
        vq = vqvae.bind(vq_vars)
        transformer = DecoderOnlyTransformer(
            num_tokens=9, max_seq_len=32, attn_layers_dim=8, attn_layers_depth=2,
            attn_layers_heads=2,
        )
        t_vars = transformer.init(jax.random.PRNGKey(1), jnp.zeros((1, 17), jnp.int32))
        tr = transformer.bind(t_vars)
        ordering = Ordering("raster_scan", 2, (1, 4, 4))
        inferer = VQVAETransformerInferer()
        starting = jnp.full((1, 1), 8)

        img_cached = inferer.sample(
            (4, 4), starting, vq, tr, ordering, top_k=1, key=jax.random.PRNGKey(3),
            use_cache=True,
        )
        img_windowed = inferer.sample(
            (4, 4), starting, vq, tr, ordering, top_k=1, key=jax.random.PRNGKey(3),
            use_cache=False,
        )
        np.testing.assert_allclose(
            np.asarray(img_cached), np.asarray(img_windowed), rtol=1e-5, atol=1e-6
        )


class TestLatentDiffusion3D:
    def test_3d_ldm_end_to_end(self):
        """BASELINE config #4 shape path: 3D AEKL + latent DDIM, tiny scale."""
        aekl = AutoencoderKL(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(4, 4), attention_levels=(False, False), latent_channels=3,
            norm_num_groups=4, with_encoder_nonlocal_attn=False,
            with_decoder_nonlocal_attn=False,
        )
        x = jnp.zeros((1, 1, 16, 16, 16))
        a_vars = aekl.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x
        )
        bound = aekl.bind(a_vars, rngs={"sampling": jax.random.PRNGKey(2)})

        unet = DiffusionModelUNet(
            spatial_dims=3, in_channels=3, out_channels=3, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True), norm_num_groups=8,
            num_head_channels=8,
        )
        z = jnp.zeros((1, 3, 8, 8, 8))
        u_vars = unet.init(jax.random.PRNGKey(3), z, jnp.array([0]))
        fn = lambda x, t, context=None, **kw: unet.apply(u_vars, x, t, context=context, **kw)

        from generativemodels_tpu.networks.schedulers import DDIMScheduler
        scheduler = DDIMScheduler(num_train_timesteps=10)
        scheduler.set_timesteps(5)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.3)

        pred = inferer(x, bound, fn, jnp.zeros_like(z), jnp.array([2]))
        assert pred.shape == z.shape
        img = inferer.sample(
            jax.random.normal(jax.random.PRNGKey(4), z.shape), bound, fn,
        )
        assert img.shape == (1, 1, 16, 16, 16)


class TestLatentPNDM:
    def test_latent_sampling_with_pndm(self, aekl_bound, latent_unet):
        """PNDM state threads correctly through the latent inferer's scan."""
        from generativemodels_tpu.networks.schedulers import PNDMScheduler

        scheduler = PNDMScheduler(num_train_timesteps=100, skip_prk_steps=True)
        scheduler.set_timesteps(10)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        noise = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        img = inferer.sample(noise, aekl_bound, latent_unet, key=jax.random.PRNGKey(1))
        assert img.shape == (2, 1, 16, 16)
        assert bool(jnp.isfinite(img).all())


class TestSPADELatentDiffusion:
    def test_seg_threads_through_both_stages(self):
        """SPADE AEKL decoder + SPADE UNet under the latent inferer: `seg`
        must reach the UNet every step and the decoder at the end
        (reference inferer.py:434-483)."""
        from generativemodels_tpu.networks.nets import (
            SPADEAutoencoderKL, SPADEDiffusionModelUNet,
        )

        label_nc = 3
        aekl = SPADEAutoencoderKL(
            spatial_dims=2, label_nc=label_nc, in_channels=1, out_channels=1,
            num_res_blocks=1, num_channels=(4, 4), attention_levels=(False, False),
            latent_channels=3, norm_num_groups=4, with_encoder_nonlocal_attn=False,
            with_decoder_nonlocal_attn=False, spade_intermediate_channels=8,
        )
        x = jnp.zeros((1, 1, 16, 16))
        seg = jnp.zeros((1, label_nc, 16, 16)).at[:, 0].set(1.0)
        a_vars = aekl.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x, seg
        )
        bound = aekl.bind(a_vars, rngs={"sampling": jax.random.PRNGKey(2)})

        unet = SPADEDiffusionModelUNet(
            spatial_dims=2, in_channels=3, out_channels=3, label_nc=label_nc,
            num_res_blocks=1, num_channels=(8, 8), attention_levels=(False, False),
            norm_num_groups=8, spade_intermediate_channels=8,
        )
        z = jnp.zeros((1, 3, 8, 8))
        seg_latent = jnp.zeros((1, label_nc, 8, 8)).at[:, 0].set(1.0)
        u_vars = unet.init(jax.random.PRNGKey(3), z, jnp.array([0]), seg_latent)

        def fn(x, t, context=None, seg=None, **kw):
            return unet.apply(u_vars, x, t, seg, context=context, **kw)

        scheduler = DDPMScheduler(num_train_timesteps=10)
        inferer = LatentDiffusionInferer(scheduler, scale_factor=0.5)
        # note: UNet consumes the latent-resolution seg; decoder the image one
        pred = inferer(
            x, bound, fn, jnp.zeros_like(z), jnp.array([2]), seg=seg_latent
        )
        assert pred.shape == z.shape


class TestARSamplingDispatch:
    """Measured KV-cache dispatch envelope (benchmarks/results_ar_sampling.json)."""

    def test_resolve_use_cache(self, monkeypatch):
        from generativemodels_tpu.inferers.vqvae_transformer import (
            _CACHE_MIN_SEQ_TPU,
            resolve_use_cache,
        )

        class Bound:
            def unbind(self):  # looks like a Flax bound module
                return None, None

        import jax as _jax

        # ineligible regardless of platform: doesn't fit / multi-token BOS
        assert not resolve_use_cache(257, 256, 1, Bound())
        assert not resolve_use_cache(200, 256, 2, Bound())
        assert not resolve_use_cache(200, 256, 1, object())

        monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
        assert resolve_use_cache(257, 257, 1, Bound())

        # on TPU short sequences stay on the windowed full-forward scan
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        assert not resolve_use_cache(257, 257, 1, Bound())
        assert resolve_use_cache(_CACHE_MIN_SEQ_TPU, 4097, 1, Bound())
