"""End-to-end goldens for the four COMPOUND inferers vs the live torch
reference, through converted-identical nets.

Per-component goldens (tests/test_zoo_convert.py) cannot catch the
orchestration wiring these inferers encode:

- LatentDiffusionInferer (reference generative/inferers/inferer.py:324-562):
  scale-factor application order (:382-386), the ldm_resizer/
  autoencoder_resizer pad/crop placement (:388-389,464-470), the
  `quantized` flag for VQVAE latents, resampled latent KL maps (:556-561).
- ControlNetDiffusionInferer (:565-851): a ControlNet forward precedes
  every UNet eval, on the SAME (possibly concat-conditioned) input.
- ControlNetLatentDiffusionInferer (:854-1123): cn_cond interpolation to
  the LATENT shape (:926-927, torch F.interpolate nearest = floor idx).
- VQVAETransformerInferer (:1126-1330): index_quantize -> ordering -> BOS
  -> crop for training; windowed-likelihood continuation (:1300-1318);
  greedy sampling trajectory.

Determinism strategy: VQVAE stage-1 encodes are deterministic; the AEKL
reparameterisation eps and the likelihood corruption noise are injected by
patching torch.randn_like on the reference side and passing the identical
array (noise=... / an eps-pinned adapter) on the flax side; the training
crop start patches torch.randint to the jax-drawn value; sampling
trajectories use DDIM eta=0 or greedy top_k=1 so no RNG survives.

Tolerances: both sides run fp32 on CPU; observed diffs are <1e-5 — 1e-4
leaves BLAS headroom (same note as tests/test_zoo_convert.py).
"""
from __future__ import annotations

import contextlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from generativemodels_tpu.inferers import (  # noqa: E402
    ControlNetDiffusionInferer,
    ControlNetLatentDiffusionInferer,
    LatentDiffusionInferer,
    VQVAETransformerInferer,
)
from generativemodels_tpu.networks import zoo_convert as zc  # noqa: E402
from generativemodels_tpu.networks.nets import (  # noqa: E402
    VQVAE,
    AutoencoderKL,
    ControlNet,
    DecoderOnlyTransformer,
    DiffusionModelUNet,
)
from generativemodels_tpu.networks.schedulers import (  # noqa: E402
    DDIMScheduler,
    DDPMScheduler,
)
from generativemodels_tpu.utils import Ordering  # noqa: E402

from .ref_loader import (
    REFERENCE_PATH,
    load_reference_inferers,
    load_reference_nets,
    load_reference_schedulers,
)

ref_nets = load_reference_nets()
ref_inf = load_reference_inferers()
ref_sched = load_reference_schedulers()

pytestmark = pytest.mark.skipif(
    ref_nets is None or ref_inf is None or ref_sched is None,
    reason="torch reference could not be imported",
)

RTOL = 1e-4
ATOL = 1e-4


def _ref_ordering(*args, **kwargs):
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from generative.utils.ordering import Ordering as RefOrdering

    return RefOrdering(*args, **kwargs)


def randomize(module, seed=0, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def assert_close(flax_out, torch_out, name="", rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(flax_out),
        torch_out.detach().cpu().numpy(),
        rtol=rtol,
        atol=atol,
        err_msg=name,
    )


@contextlib.contextmanager
def patched_randn_like(arr: np.ndarray):
    """torch.randn_like returns `arr` (the injected eps/noise) for its shape."""
    fixed = torch.from_numpy(arr)
    orig = torch.randn_like

    def fake(t, *a, **k):
        assert tuple(t.shape) == tuple(fixed.shape), (t.shape, fixed.shape)
        return fixed.to(t.dtype)

    torch.randn_like = fake
    try:
        yield
    finally:
        torch.randn_like = orig


@contextlib.contextmanager
def patched_randint(value: int):
    """torch.randint returns `value` (matches the jax-drawn crop start)."""
    orig = torch.randint

    def fake(*a, **k):
        size = k.get("size", (1,))
        return torch.full(size, value, dtype=torch.long)

    torch.randint = fake
    try:
        yield
    finally:
        torch.randint = orig


# ---------------------------------------------------------------------------
# converted-identical builders
# ---------------------------------------------------------------------------

def build_unet(cfg, seed, latent_shape, ctx_dim=None):
    ref = ref_nets.DiffusionModelUNet(**cfg)
    ref.eval()
    randomize(ref, seed)
    model = DiffusionModelUNet(**cfg)
    init_args = [jnp.zeros(latent_shape), jnp.zeros((latent_shape[0],), jnp.int32)]
    if ctx_dim is not None:
        init_args.append(jnp.zeros((latent_shape[0], 3, ctx_dim)))
    struct = zc.params_structure(model, *init_args)
    params = zc.convert_diffusion_model_unet(ref.state_dict(), struct)

    def fn(x, timesteps, context=None, **kwargs):
        return model.apply({"params": params}, x, timesteps, context=context, **kwargs)

    return ref, fn


def build_controlnet(cfg, seed, latent_shape, cond_shape, ctx_dim=None):
    ref = ref_nets.ControlNet(**cfg)
    ref.eval()
    randomize(ref, seed)
    model = ControlNet(**cfg)
    init_args = [
        jnp.zeros(latent_shape),
        jnp.zeros((latent_shape[0],), jnp.int32),
        jnp.zeros(cond_shape),
    ]
    init_kwargs = {}
    if ctx_dim is not None:
        init_kwargs["context"] = jnp.zeros((latent_shape[0], 3, ctx_dim))
    struct = zc.params_structure(model, *init_args, **init_kwargs)
    params = zc.convert_controlnet(ref.state_dict(), struct)

    def fn(x, timesteps, controlnet_cond, context=None):
        return model.apply(
            {"params": params}, x, timesteps, controlnet_cond, context=context
        )

    return ref, fn


def build_vqvae(cfg, seed, x_shape):
    ref = ref_nets.VQVAE(**cfg)
    ref.eval()
    randomize(ref, seed)
    model = VQVAE(**cfg)
    struct = zc.params_structure(model, jnp.zeros(x_shape))
    params, codebook = zc.convert_vqvae(
        ref.state_dict(),
        struct,
        num_channels=cfg["num_channels"],
        num_res_layers=cfg["num_res_layers"],
    )
    return ref, model.bind({"params": params, "codebook": codebook})


class _EpsAEKL:
    """Bound flax AutoencoderKL with the reparameterisation eps pinned.

    The reference's encode_stage_2_inputs draws eps via torch.randn_like
    (autoencoderkl.py:792-795); pinning the identical eps on both sides
    keeps the stage-2 encode deterministic while still exercising mu/sigma
    (a swap or scale bug would surface).
    """

    def __init__(self, bound, eps):
        self._bound = bound
        self._eps = jnp.asarray(eps)

    def encode_stage_2_inputs(self, x):
        z_mu, z_sigma = self._bound.encode(x)
        return z_mu + self._eps * z_sigma

    def decode_stage_2_outputs(self, z):
        return self._bound.decode_stage_2_outputs(z)


def build_aekl(cfg, seed, x_shape, eps):
    ref = ref_nets.AutoencoderKL(**cfg)
    ref.eval()
    randomize(ref, seed)
    model = AutoencoderKL(**cfg)
    struct = zc.params_structure(
        model,
        jnp.zeros(x_shape),
        rngs={"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    )
    params = zc.convert_autoencoderkl(
        ref.state_dict(),
        struct,
        num_channels=cfg["num_channels"],
        num_res_blocks=cfg["num_res_blocks"],
        attention_levels=cfg["attention_levels"],
        with_encoder_nonlocal_attn=cfg.get("with_encoder_nonlocal_attn", True),
        with_decoder_nonlocal_attn=cfg.get("with_decoder_nonlocal_attn", True),
    )
    return ref, _EpsAEKL(model.bind({"params": params}), eps)


def build_transformer(cfg, seed, ctx_dim=None):
    ref = ref_nets.DecoderOnlyTransformer(**cfg)
    ref.eval()
    randomize(ref, seed)
    model = DecoderOnlyTransformer(**cfg)
    init_args = [jnp.zeros((2, cfg["max_seq_len"]), jnp.int32)]
    if ctx_dim is not None:
        init_args.append(jnp.zeros((2, 3, ctx_dim)))
    struct = zc.params_structure(model, *init_args)
    params = zc.convert_transformer(ref.state_dict(), struct)
    return ref, model.bind({"params": params})


# ---------------------------------------------------------------------------
# tiny configs
# ---------------------------------------------------------------------------

VQ_CFG_2D = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    num_channels=(8, 8),
    num_res_layers=1,
    num_res_channels=(8, 8),
    downsample_parameters=((2, 4, 1, 1), (2, 4, 1, 1)),
    upsample_parameters=((2, 4, 1, 1, 0), (2, 4, 1, 1, 0)),
    num_embeddings=16,
    embedding_dim=4,
)  # 16x16 image -> 4x4 latent, 4 channels

VQ_CFG_3D = dict(VQ_CFG_2D, spatial_dims=3)  # 8^3 image -> 2^3 latent

UNET_LAT_2D = dict(
    spatial_dims=2,
    in_channels=4,
    out_channels=4,
    num_res_blocks=1,
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=8,
)

UNET_LAT_3D = dict(UNET_LAT_2D, spatial_dims=3, attention_levels=(False, False))

CN_LAT_2D = dict(
    spatial_dims=2,
    in_channels=4,
    num_res_blocks=1,
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=4,
    conditioning_embedding_num_channels=(8,),
)

AEKL_CFG_2D = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    num_res_blocks=(1, 1),
    num_channels=(8, 8),
    attention_levels=(False, False),
    latent_channels=3,
    norm_num_groups=8,
    with_encoder_nonlocal_attn=False,
    with_decoder_nonlocal_attn=False,
)  # 16x16 -> 8x8 latent, 3 channels


# ---------------------------------------------------------------------------
# LatentDiffusionInferer
# ---------------------------------------------------------------------------

class TestLatentDiffusionInfererGolden:
    @pytest.fixture(scope="class")
    def vq_stack(self):
        ref_vq, vq_bound = build_vqvae(VQ_CFG_2D, seed=10, x_shape=(2, 1, 16, 16))
        ref_unet, unet_fn = build_unet(UNET_LAT_2D, seed=11, latent_shape=(2, 4, 4, 4))
        return ref_vq, vq_bound, ref_unet, unet_fn

    @pytest.mark.parametrize("quantized", [True, False])
    def test_call_train_forward(self, vq_stack, quantized):
        """scale_factor order + quantized flag vs inferer.py:382-404."""
        ref_vq, vq_bound, ref_unet, unet_fn = vq_stack
        rs = np.random.RandomState(0)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 4, 4, 4).astype(np.float32)
        ts = np.array([3, 7])

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                quantized=quantized,
            )

        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        pred_f = f_inf(
            jnp.asarray(x),
            vq_bound,
            unet_fn,
            jnp.asarray(noise),
            jnp.asarray(ts),
            quantized=quantized,
        )
        assert_close(pred_f, pred_t, f"latent train forward quantized={quantized}")

    def test_sample_ddim_deterministic(self, vq_stack):
        """Full DDIM-10 latent trajectory + stage-1 decode (inferer.py:408-487)."""
        ref_vq, vq_bound, ref_unet, unet_fn = vq_stack
        rs = np.random.RandomState(1)
        z = rs.randn(2, 4, 4, 4).astype(np.float32)

        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(10)
        t_inf = ref_inf.LatentDiffusionInferer(t_s, scale_factor=0.3)
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                scheduler=t_s,
                verbose=False,
            )

        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(10)
        f_inf = LatentDiffusionInferer(f_s, scale_factor=0.3)
        img_f = f_inf.sample(jnp.asarray(z), vq_bound, unet_fn, scheduler=f_s, eta=0.0)
        assert_close(img_f, img_t, "latent DDIM-10 sample")

    def test_sample_mismatched_latent_shapes(self, vq_stack):
        """ldm_resizer pad + autoencoder_resizer crop placement
        (inferer.py:352-354,388-389,464-470): UNet runs on 6x6 padded
        latents, the decoder gets the center-cropped 4x4."""
        ref_vq, vq_bound, _, _ = vq_stack
        ref_unet, unet_fn = build_unet(UNET_LAT_2D, seed=12, latent_shape=(2, 4, 6, 6))
        rs = np.random.RandomState(2)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 4, 6, 6).astype(np.float32)
        ts = np.array([2, 9])

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10),
            scale_factor=0.5,
            ldm_latent_shape=[6, 6],
            autoencoder_latent_shape=[4, 4],
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
            )
        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10),
            scale_factor=0.5,
            ldm_latent_shape=[6, 6],
            autoencoder_latent_shape=[4, 4],
        )
        pred_f = f_inf(
            jnp.asarray(x), vq_bound, unet_fn, jnp.asarray(noise), jnp.asarray(ts)
        )
        assert_close(pred_f, pred_t, "padded-latent train forward")

        # and the sampling direction (pad shape in, cropped decode out)
        z = rs.randn(2, 4, 6, 6).astype(np.float32)
        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        t_inf.scheduler = t_s
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                scheduler=t_s,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        img_f = f_inf.sample(jnp.asarray(z), vq_bound, unet_fn, scheduler=f_s, eta=0.0)
        assert_close(img_f, img_t, "padded-latent sample")

    def test_get_likelihood_resampled(self, vq_stack):
        """Latent ELBO + nearest-resampled KL maps (inferer.py:489-562)."""
        ref_vq, vq_bound, ref_unet, unet_fn = vq_stack
        rs = np.random.RandomState(3)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 4, 4, 4).astype(np.float32)

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        with patched_randn_like(noise), torch.no_grad():
            total_t, maps_t = t_inf.get_likelihood(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                save_intermediates=True,
                resample_latent_likelihoods=True,
                resample_interpolation_mode="nearest",
                verbose=False,
            )

        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        total_f, maps_f = f_inf.get_likelihood(
            jnp.asarray(x),
            vq_bound,
            unet_fn,
            save_intermediates=True,
            resample_latent_likelihoods=True,
            resample_interpolation_mode="nearest",
            noise=jnp.asarray(noise),
        )
        assert_close(total_f, total_t, "latent ELBO total")
        assert len(maps_f) == len(maps_t)
        for i, (a, b) in enumerate(zip(maps_f, maps_t)):
            assert_close(a, b, f"resampled KL map {i}", rtol=1e-3, atol=1e-5)

    def test_aekl_stage1_call_and_sample(self):
        """AEKL stage-1 with pinned reparameterisation eps
        (inferer.py:383-386 via autoencoderkl.py:792-795)."""
        rs = np.random.RandomState(4)
        eps = rs.randn(2, 3, 8, 8).astype(np.float32)
        ref_ae, ae_shim = build_aekl(AEKL_CFG_2D, seed=13, x_shape=(2, 1, 16, 16), eps=eps)
        unet_cfg = dict(UNET_LAT_2D, in_channels=3, out_channels=3)
        ref_unet, unet_fn = build_unet(unet_cfg, seed=14, latent_shape=(2, 3, 8, 8))

        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 3, 8, 8).astype(np.float32)
        ts = np.array([1, 8])

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.7
        )
        with patched_randn_like(eps), torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_ae,
                diffusion_model=ref_unet,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
            )
        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.7
        )
        pred_f = f_inf(
            jnp.asarray(x), ae_shim, unet_fn, jnp.asarray(noise), jnp.asarray(ts)
        )
        assert_close(pred_f, pred_t, "AEKL latent train forward")

        z = rs.randn(2, 3, 8, 8).astype(np.float32)
        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        t_inf.scheduler = t_s
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                autoencoder_model=ref_ae,
                diffusion_model=ref_unet,
                scheduler=t_s,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        img_f = f_inf.sample(jnp.asarray(z), ae_shim, unet_fn, scheduler=f_s, eta=0.0)
        assert_close(img_f, img_t, "AEKL latent sample")

    @pytest.mark.slow
    def test_3d_call_and_sample(self):
        # 16^3 image -> 4^3 latent: keeps the torch UNet's coarsest level at
        # 2^3 (torch GroupNorm rejects 1-value-per-channel spatial grids)
        ref_vq, vq_bound = build_vqvae(VQ_CFG_3D, seed=15, x_shape=(1, 1, 16, 16, 16))
        ref_unet, unet_fn = build_unet(
            UNET_LAT_3D, seed=16, latent_shape=(1, 4, 4, 4, 4)
        )
        rs = np.random.RandomState(5)
        x = rs.rand(1, 1, 16, 16, 16).astype(np.float32)
        noise = rs.randn(1, 4, 4, 4, 4).astype(np.float32)
        ts = np.array([6])

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.4
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
            )
        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.4
        )
        pred_f = f_inf(
            jnp.asarray(x), vq_bound, unet_fn, jnp.asarray(noise), jnp.asarray(ts)
        )
        assert_close(pred_f, pred_t, "3D latent train forward")

        z = rs.randn(1, 4, 4, 4, 4).astype(np.float32)
        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        t_inf.scheduler = t_s
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                scheduler=t_s,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        img_f = f_inf.sample(jnp.asarray(z), vq_bound, unet_fn, scheduler=f_s, eta=0.0)
        assert_close(img_f, img_t, "3D latent sample")


# ---------------------------------------------------------------------------
# ControlNetDiffusionInferer
# ---------------------------------------------------------------------------

CN_IMG_2D = dict(
    spatial_dims=2,
    in_channels=1,
    num_res_blocks=1,
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=4,
    conditioning_embedding_num_channels=(8,),
)

UNET_IMG_2D = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    num_res_blocks=1,
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=4,
)


class TestControlNetDiffusionInfererGolden:
    @pytest.fixture(scope="class")
    def stack(self):
        ref_unet, unet_fn = build_unet(UNET_IMG_2D, seed=20, latent_shape=(2, 1, 16, 16))
        ref_cn, cn_fn = build_controlnet(
            CN_IMG_2D, seed=21, latent_shape=(2, 1, 16, 16), cond_shape=(2, 1, 16, 16)
        )
        return ref_unet, unet_fn, ref_cn, cn_fn

    def test_call_train_forward(self, stack):
        """ControlNet residuals feed the UNet on the same noisy input
        (inferer.py:605-630)."""
        ref_unet, unet_fn, ref_cn, cn_fn = stack
        rs = np.random.RandomState(6)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)
        ts = np.array([4, 9])

        t_inf = ref_inf.ControlNetDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10)
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond),
            )
        f_inf = ControlNetDiffusionInferer(DDPMScheduler(num_train_timesteps=10))
        pred_f = f_inf(
            jnp.asarray(x),
            unet_fn,
            cn_fn,
            jnp.asarray(noise),
            jnp.asarray(ts),
            jnp.asarray(cn_cond),
        )
        assert_close(pred_f, pred_t, "CN train forward")

    def test_sample_ddim_deterministic(self, stack):
        ref_unet, unet_fn, ref_cn, cn_fn = stack
        rs = np.random.RandomState(7)
        z = rs.randn(1, 1, 16, 16).astype(np.float32)
        cn_cond = rs.rand(1, 1, 16, 16).astype(np.float32)

        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(10)
        t_inf = ref_inf.ControlNetDiffusionInferer(t_s)
        with torch.no_grad():
            out_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                cn_cond=torch.from_numpy(cn_cond),
                scheduler=t_s,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(10)
        f_inf = ControlNetDiffusionInferer(f_s)
        out_f = f_inf.sample(
            jnp.asarray(z), unet_fn, cn_fn, jnp.asarray(cn_cond), scheduler=f_s, eta=0.0
        )
        assert_close(out_f, out_t, "CN DDIM-10 sample")

    def test_get_likelihood(self, stack):
        ref_unet, unet_fn, ref_cn, cn_fn = stack
        rs = np.random.RandomState(8)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)

        t_inf = ref_inf.ControlNetDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10)
        )
        with patched_randn_like(noise), torch.no_grad():
            total_t = t_inf.get_likelihood(
                inputs=torch.from_numpy(x),
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                cn_cond=torch.from_numpy(cn_cond),
                verbose=False,
            )
        f_inf = ControlNetDiffusionInferer(DDPMScheduler(num_train_timesteps=10))
        total_f = f_inf.get_likelihood(
            jnp.asarray(x),
            unet_fn,
            cn_fn,
            jnp.asarray(cn_cond),
            noise=jnp.asarray(noise),
        )
        assert_close(total_f, total_t, "CN ELBO total")

    def test_crossattn_conditioned_call(self):
        """crossattn context reaches BOTH the ControlNet and the UNet
        (inferer.py:614-630)."""
        ctx_dim = 6
        unet_cfg = dict(UNET_IMG_2D, with_conditioning=True, cross_attention_dim=ctx_dim)
        cn_cfg = dict(CN_IMG_2D, with_conditioning=True, cross_attention_dim=ctx_dim)
        ref_unet, unet_fn = build_unet(
            unet_cfg, seed=22, latent_shape=(2, 1, 16, 16), ctx_dim=ctx_dim
        )
        ref_cn, cn_fn = build_controlnet(
            cn_cfg, seed=23, latent_shape=(2, 1, 16, 16), cond_shape=(2, 1, 16, 16),
            ctx_dim=ctx_dim,
        )
        rs = np.random.RandomState(9)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)
        ctx = rs.randn(2, 3, ctx_dim).astype(np.float32)
        ts = np.array([2, 7])

        t_inf = ref_inf.ControlNetDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10)
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond),
                condition=torch.from_numpy(ctx),
                mode="crossattn",
            )
        f_inf = ControlNetDiffusionInferer(DDPMScheduler(num_train_timesteps=10))
        pred_f = f_inf(
            jnp.asarray(x),
            unet_fn,
            cn_fn,
            jnp.asarray(noise),
            jnp.asarray(ts),
            jnp.asarray(cn_cond),
            condition=jnp.asarray(ctx),
            mode="crossattn",
        )
        assert_close(pred_f, pred_t, "CN crossattn train forward")

    @pytest.mark.slow
    def test_3d_call_and_sample(self):
        unet_cfg = dict(UNET_IMG_2D, spatial_dims=3, attention_levels=(False, False))
        cn_cfg = dict(CN_IMG_2D, spatial_dims=3, attention_levels=(False, False))
        ref_unet, unet_fn = build_unet(unet_cfg, seed=24, latent_shape=(1, 1, 8, 8, 8))
        ref_cn, cn_fn = build_controlnet(
            cn_cfg, seed=25, latent_shape=(1, 1, 8, 8, 8), cond_shape=(1, 1, 8, 8, 8)
        )
        rs = np.random.RandomState(10)
        x = rs.rand(1, 1, 8, 8, 8).astype(np.float32)
        noise = rs.randn(1, 1, 8, 8, 8).astype(np.float32)
        cn_cond = rs.rand(1, 1, 8, 8, 8).astype(np.float32)
        ts = np.array([5])

        t_inf = ref_inf.ControlNetDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10)
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond),
            )
        f_inf = ControlNetDiffusionInferer(DDPMScheduler(num_train_timesteps=10))
        pred_f = f_inf(
            jnp.asarray(x), unet_fn, cn_fn, jnp.asarray(noise), jnp.asarray(ts),
            jnp.asarray(cn_cond),
        )
        assert_close(pred_f, pred_t, "3D CN train forward")

        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        t_inf.scheduler = t_s
        z = rs.randn(1, 1, 8, 8, 8).astype(np.float32)
        with torch.no_grad():
            out_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                cn_cond=torch.from_numpy(cn_cond),
                scheduler=t_s,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        out_f = f_inf.sample(
            jnp.asarray(z), unet_fn, cn_fn, jnp.asarray(cn_cond), scheduler=f_s, eta=0.0
        )
        assert_close(out_f, out_t, "3D CN sample")


# ---------------------------------------------------------------------------
# ControlNetLatentDiffusionInferer
# ---------------------------------------------------------------------------

class TestControlNetLatentGolden:
    @pytest.fixture(scope="class")
    def stack(self):
        ref_vq, vq_bound = build_vqvae(VQ_CFG_2D, seed=30, x_shape=(2, 1, 16, 16))
        ref_unet, unet_fn = build_unet(UNET_LAT_2D, seed=31, latent_shape=(2, 4, 4, 4))
        ref_cn, cn_fn = build_controlnet(
            CN_LAT_2D, seed=32, latent_shape=(2, 4, 4, 4), cond_shape=(2, 1, 4, 4)
        )
        return ref_vq, vq_bound, ref_unet, unet_fn, ref_cn, cn_fn

    def test_call_with_cn_cond_interpolation(self, stack):
        """cn_cond at image scale is nearest-interpolated to the LATENT
        shape (inferer.py:926-927, torch floor-index convention)."""
        ref_vq, vq_bound, ref_unet, unet_fn, ref_cn, cn_fn = stack
        rs = np.random.RandomState(11)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 4, 4, 4).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)  # image scale
        ts = np.array([3, 8])

        t_inf = ref_inf.ControlNetLatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond),
            )
        f_inf = ControlNetLatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        pred_f = f_inf(
            jnp.asarray(x),
            vq_bound,
            unet_fn,
            cn_fn,
            jnp.asarray(noise),
            jnp.asarray(ts),
            jnp.asarray(cn_cond),
        )
        assert_close(pred_f, pred_t, "CN-latent train forward")

    def test_sample_ddim_deterministic(self, stack):
        ref_vq, vq_bound, ref_unet, unet_fn, ref_cn, cn_fn = stack
        rs = np.random.RandomState(12)
        z = rs.randn(2, 4, 4, 4).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)

        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(10)
        t_inf = ref_inf.ControlNetLatentDiffusionInferer(t_s, scale_factor=0.3)
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                cn_cond=torch.from_numpy(cn_cond),
                scheduler=t_s,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(10)
        f_inf = ControlNetLatentDiffusionInferer(f_s, scale_factor=0.3)
        img_f = f_inf.sample(
            jnp.asarray(z), vq_bound, unet_fn, cn_fn, jnp.asarray(cn_cond),
            scheduler=f_s, eta=0.0,
        )
        assert_close(img_f, img_t, "CN-latent DDIM-10 sample")

    def test_get_likelihood_resampled(self, stack):
        ref_vq, vq_bound, ref_unet, unet_fn, ref_cn, cn_fn = stack
        rs = np.random.RandomState(13)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 4, 4, 4).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)

        t_inf = ref_inf.ControlNetLatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        with patched_randn_like(noise), torch.no_grad():
            total_t, maps_t = t_inf.get_likelihood(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_vq,
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                cn_cond=torch.from_numpy(cn_cond),
                save_intermediates=True,
                resample_latent_likelihoods=True,
                resample_interpolation_mode="bilinear",
                verbose=False,
            )
        f_inf = ControlNetLatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.3
        )
        total_f, maps_f = f_inf.get_likelihood(
            jnp.asarray(x),
            vq_bound,
            unet_fn,
            cn_fn,
            jnp.asarray(cn_cond),
            save_intermediates=True,
            resample_latent_likelihoods=True,
            resample_interpolation_mode="bilinear",
            noise=jnp.asarray(noise),
        )
        assert_close(total_f, total_t, "CN-latent ELBO total")
        assert len(maps_f) == len(maps_t)
        for i, (a, b) in enumerate(zip(maps_f, maps_t)):
            assert_close(a, b, f"CN-latent resampled KL map {i}", rtol=1e-3, atol=1e-5)

    @pytest.mark.slow
    def test_3d_call(self):
        # 16^3 image -> 4^3 latent (torch GroupNorm needs >1 spatial value at
        # the coarsest UNet/ControlNet level)
        vq_ref, vq_bound = build_vqvae(VQ_CFG_3D, seed=33, x_shape=(1, 1, 16, 16, 16))
        unet_cfg = dict(UNET_LAT_3D)
        ref_unet, unet_fn = build_unet(unet_cfg, seed=34, latent_shape=(1, 4, 4, 4, 4))
        cn_cfg = dict(CN_LAT_2D, spatial_dims=3, attention_levels=(False, False))
        ref_cn, cn_fn = build_controlnet(
            cn_cfg, seed=35, latent_shape=(1, 4, 4, 4, 4), cond_shape=(1, 1, 4, 4, 4)
        )
        rs = np.random.RandomState(14)
        x = rs.rand(1, 1, 16, 16, 16).astype(np.float32)
        noise = rs.randn(1, 4, 4, 4, 4).astype(np.float32)
        cn_cond = rs.rand(1, 1, 16, 16, 16).astype(np.float32)
        ts = np.array([7])

        t_inf = ref_inf.ControlNetLatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.4
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=vq_ref,
                diffusion_model=ref_unet,
                controlnet=ref_cn,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond),
            )
        f_inf = ControlNetLatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.4
        )
        pred_f = f_inf(
            jnp.asarray(x), vq_bound, unet_fn, cn_fn, jnp.asarray(noise),
            jnp.asarray(ts), jnp.asarray(cn_cond),
        )
        assert_close(pred_f, pred_t, "3D CN-latent train forward")


# ---------------------------------------------------------------------------
# VQVAETransformerInferer
# ---------------------------------------------------------------------------

TR_CFG_16 = dict(
    num_tokens=17,  # num_embeddings + 1 (BOS)
    max_seq_len=16,
    attn_layers_dim=8,
    attn_layers_depth=2,
    attn_layers_heads=2,
)

TR_CFG_8 = dict(TR_CFG_16, max_seq_len=8)


class TestVQVAETransformerGolden:
    @pytest.fixture(scope="class")
    def stack(self):
        ref_vq, vq_bound = build_vqvae(VQ_CFG_2D, seed=40, x_shape=(2, 1, 16, 16))
        ref_tr, tr_bound = build_transformer(TR_CFG_16, seed=41)
        f_ord = Ordering("s_curve", 2, (1, 4, 4))
        t_ord = _ref_ordering(ordering_type="s_curve", spatial_dims=2, dimensions=(1, 4, 4))
        np.testing.assert_array_equal(
            np.asarray(f_ord.get_sequence_ordering()), t_ord.get_sequence_ordering()
        )
        return ref_vq, vq_bound, ref_tr, tr_bound, f_ord, t_ord

    def test_teacher_forced_logits(self, stack):
        """index_quantize -> s-curve ordering -> BOS prepend -> logits
        (inferer.py:1135-1181)."""
        ref_vq, vq_bound, ref_tr, tr_bound, f_ord, t_ord = stack
        rs = np.random.RandomState(15)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)

        with torch.no_grad():
            logits_t, target_t, spatial_t = ref_inf.VQVAETransformerInferer()(
                inputs=torch.from_numpy(x),
                vqvae_model=ref_vq,
                transformer_model=ref_tr,
                ordering=t_ord,
                return_latent=True,
            )
        f_inf = VQVAETransformerInferer()
        logits_f, target_f, spatial_f = f_inf(
            jnp.asarray(x), vq_bound, tr_bound, f_ord, return_latent=True
        )
        assert tuple(spatial_f) == tuple(spatial_t)
        np.testing.assert_array_equal(np.asarray(target_f), target_t.numpy())
        assert_close(logits_f, logits_t, "teacher-forced logits")

    def test_teacher_forced_random_crop(self, stack):
        """Over-length training crop (inferer.py:1170-1176): the torch
        randint start is patched to the jax-drawn value so both frameworks
        crop the identical window."""
        ref_vq, vq_bound, _, _, f_ord, t_ord = stack
        ref_tr8, tr8_bound = build_transformer(TR_CFG_8, seed=42)
        rs = np.random.RandomState(16)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)

        key = jax.random.PRNGKey(77)
        start_val = int(jax.random.randint(key, (), 0, 16 + 1 - 8))

        with patched_randint(start_val), torch.no_grad():
            logits_t, target_t, _ = ref_inf.VQVAETransformerInferer()(
                inputs=torch.from_numpy(x),
                vqvae_model=ref_vq,
                transformer_model=ref_tr8,
                ordering=t_ord,
                return_latent=True,
            )
        f_inf = VQVAETransformerInferer()
        logits_f, target_f, _ = f_inf(
            jnp.asarray(x), vq_bound, tr8_bound, f_ord, return_latent=True, key=key
        )
        np.testing.assert_array_equal(np.asarray(target_f), target_t.numpy())
        assert_close(logits_f, logits_t, "cropped teacher-forced logits")

    def test_likelihood_full_and_windowed(self, stack):
        """Spatial log-prob map: single-pass path AND the windowed
        continuation for positions >= max_seq_len (inferer.py:1282-1318)."""
        ref_vq, vq_bound, ref_tr, tr_bound, f_ord, t_ord = stack
        rs = np.random.RandomState(17)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        f_inf = VQVAETransformerInferer()
        t_inf = ref_inf.VQVAETransformerInferer()

        with torch.no_grad():
            ll_t = t_inf.get_likelihood(
                inputs=torch.from_numpy(x), vqvae_model=ref_vq,
                transformer_model=ref_tr, ordering=t_ord,
            )
        ll_f = f_inf.get_likelihood(jnp.asarray(x), vq_bound, tr_bound, f_ord)
        assert_close(ll_f, ll_t, "likelihood map (single pass)")

        ref_tr8, tr8_bound = build_transformer(TR_CFG_8, seed=43)
        with torch.no_grad():
            ll_t8 = t_inf.get_likelihood(
                inputs=torch.from_numpy(x), vqvae_model=ref_vq,
                transformer_model=ref_tr8, ordering=t_ord,
            )
        ll_f8 = f_inf.get_likelihood(jnp.asarray(x), vq_bound, tr8_bound, f_ord)
        assert_close(ll_f8, ll_t8, "likelihood map (windowed continuation)")

        # resampled to image resolution (bilinear upsample, inferer.py:1323-1325)
        with torch.no_grad():
            llr_t = t_inf.get_likelihood(
                inputs=torch.from_numpy(x), vqvae_model=ref_vq,
                transformer_model=ref_tr, ordering=t_ord,
                resample_latent_likelihoods=True,
                resample_interpolation_mode="bilinear",
            )
        llr_f = f_inf.get_likelihood(
            jnp.asarray(x), vq_bound, tr_bound, f_ord,
            resample_latent_likelihoods=True,
            resample_interpolation_mode="bilinear",
        )
        assert_close(llr_f, llr_t, "resampled likelihood map", rtol=1e-3, atol=1e-5)

    @pytest.mark.parametrize("use_cache", [False, True])
    def test_greedy_sample_trajectory(self, stack, use_cache):
        """Greedy (top_k=1) AR trajectory is deterministic in both
        frameworks — the decoded images must agree (inferer.py:1184-1246).
        Covers BOTH flax decode paths (windowed scan and KV-cache)."""
        ref_vq, vq_bound, ref_tr, tr_bound, f_ord, t_ord = stack
        start_t = torch.full((2, 1), 16, dtype=torch.long)
        start_f = jnp.full((2, 1), 16, jnp.int32)

        with torch.no_grad():
            img_t = ref_inf.VQVAETransformerInferer().sample(
                latent_spatial_dim=(4, 4),
                starting_tokens=start_t,
                vqvae_model=ref_vq,
                transformer_model=ref_tr,
                ordering=t_ord,
                top_k=1,
                verbose=False,
            )
        img_f = VQVAETransformerInferer().sample(
            (4, 4), start_f, vq_bound, tr_bound, f_ord, top_k=1,
            key=jax.random.PRNGKey(0), use_cache=use_cache,
        )
        assert_close(img_f, img_t, f"greedy sample (use_cache={use_cache})")

    @pytest.mark.slow
    def test_3d_teacher_forced_and_likelihood(self):
        ref_vq, vq_bound = build_vqvae(VQ_CFG_3D, seed=44, x_shape=(1, 1, 8, 8, 8))
        ref_tr, tr_bound = build_transformer(dict(TR_CFG_16, max_seq_len=8), seed=45)
        f_ord = Ordering("raster_scan", 3, (1, 2, 2, 2))
        t_ord = _ref_ordering(
            ordering_type="raster_scan", spatial_dims=3, dimensions=(1, 2, 2, 2)
        )
        rs = np.random.RandomState(18)
        x = rs.rand(1, 1, 8, 8, 8).astype(np.float32)

        with torch.no_grad():
            logits_t = ref_inf.VQVAETransformerInferer()(
                inputs=torch.from_numpy(x), vqvae_model=ref_vq,
                transformer_model=ref_tr, ordering=t_ord,
            )
        logits_f = VQVAETransformerInferer()(jnp.asarray(x), vq_bound, tr_bound, f_ord)
        assert_close(logits_f, logits_t, "3D teacher-forced logits")

        with torch.no_grad():
            ll_t = ref_inf.VQVAETransformerInferer().get_likelihood(
                inputs=torch.from_numpy(x), vqvae_model=ref_vq,
                transformer_model=ref_tr, ordering=t_ord,
            )
        ll_f = VQVAETransformerInferer().get_likelihood(
            jnp.asarray(x), vq_bound, tr_bound, f_ord
        )
        assert_close(ll_f, ll_t, "3D likelihood map")


# ---------------------------------------------------------------------------
# SPADE through the LatentDiffusionInferer (seg routed BOTH to the SPADE
# UNet per step and to the SPADE decoder at the end)
# ---------------------------------------------------------------------------

SPADE_UNET_LAT_2D = dict(
    spatial_dims=2,
    in_channels=3,
    out_channels=3,
    label_nc=3,
    num_res_blocks=(1, 1),
    num_channels=(8, 8),
    attention_levels=(False, True),
    norm_num_groups=8,
    num_head_channels=4,
)

SPADE_AEKL_CFG_2D = dict(
    spatial_dims=2,
    in_channels=1,
    out_channels=1,
    label_nc=3,
    num_res_blocks=(1, 1),
    num_channels=(8, 8),
    attention_levels=(False, False),
    latent_channels=3,
    norm_num_groups=8,
)


class _EpsSPADEAEKL:
    """SPADE AEKL shim: pinned reparameterisation eps + seg-aware decode.

    Exposes `label_nc` so the inferer's SPADE detection
    (inferers/latent.py _takes_seg, mirroring the reference's
    isinstance(autoencoder_model, SPADEAutoencoderKL) at
    inferer.py:464-470) routes `seg` into the decode."""

    def __init__(self, bound, eps, label_nc):
        self._bound = bound
        self._eps = jnp.asarray(eps)
        self.label_nc = label_nc

    def encode_stage_2_inputs(self, x):
        z_mu, z_sigma = self._bound.encode(x)
        return z_mu + self._eps * z_sigma

    def decode_stage_2_outputs(self, z, seg=None):
        return self._bound.decode_stage_2_outputs(z, seg)


class TestSPADELatentGolden:
    """The reference wires seg to TWO places the component goldens can't
    see together: partial(diffusion_model, seg=seg) around every UNet
    eval (inferer.py:393,457-459) and the SPADEAutoencoderKL decode
    (inferer.py:464-470)."""

    @pytest.fixture(scope="class")
    def stack(self):
        from generativemodels_tpu.networks.nets import (
            SPADEAutoencoderKL,
            SPADEDiffusionModelUNet,
        )

        rs = np.random.RandomState(21)
        eps = rs.randn(2, 3, 8, 8).astype(np.float32)

        torch.manual_seed(0)
        ref_ae = ref_nets.SPADEAutoencoderKL(**SPADE_AEKL_CFG_2D)
        ref_ae.eval()
        randomize(ref_ae, 31)
        ae = SPADEAutoencoderKL(**SPADE_AEKL_CFG_2D)
        rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
        ae_struct = zc.params_structure(
            ae, jnp.zeros((2, 1, 16, 16)), jnp.zeros((2, 3, 16, 16)), rngs=rngs
        )
        ae_params = zc.convert_spade_autoencoderkl(
            ref_ae.state_dict(),
            ae_struct,
            num_channels=SPADE_AEKL_CFG_2D["num_channels"],
            num_res_blocks=SPADE_AEKL_CFG_2D["num_res_blocks"],
            attention_levels=SPADE_AEKL_CFG_2D["attention_levels"],
        )
        ae_shim = _EpsSPADEAEKL(
            ae.bind({"params": ae_params}), eps, SPADE_AEKL_CFG_2D["label_nc"]
        )

        ref_unet = ref_nets.SPADEDiffusionModelUNet(**SPADE_UNET_LAT_2D)
        ref_unet.eval()
        randomize(ref_unet, 32)
        unet = SPADEDiffusionModelUNet(**SPADE_UNET_LAT_2D)
        u_struct = zc.params_structure(
            unet,
            jnp.zeros((2, 3, 8, 8)),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 3, 8, 8)),
        )
        u_params = zc.convert_spade_diffusion_model_unet(
            ref_unet.state_dict(), u_struct
        )

        def unet_fn(x, timesteps, context=None, seg=None):
            return unet.apply({"params": u_params}, x, timesteps, seg, context=context)

        return rs, eps, ref_ae, ae_shim, ref_unet, unet_fn

    def test_call_train_forward_with_seg(self, stack):
        rs, eps, ref_ae, ae_shim, ref_unet, unet_fn = stack
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        # seg at IMAGE resolution for the decoder; the latent UNet's SPADE
        # norms downscale it internally (reference passes one seg to both)
        seg_lat = (rs.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
        noise = rs.randn(2, 3, 8, 8).astype(np.float32)
        ts = np.array([2, 7])

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.6
        )
        with patched_randn_like(eps), torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x),
                autoencoder_model=ref_ae,
                diffusion_model=ref_unet,
                noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                seg=torch.from_numpy(seg_lat),
            )
        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.6
        )
        pred_f = f_inf(
            jnp.asarray(x), ae_shim, unet_fn, jnp.asarray(noise),
            jnp.asarray(ts), seg=jnp.asarray(seg_lat),
        )
        assert_close(pred_f, pred_t, "SPADE latent train forward")

    def test_sample_routes_seg_to_unet_and_decoder(self, stack):
        rs, eps, ref_ae, ae_shim, ref_unet, unet_fn = stack
        seg_lat = (rs.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
        z = rs.randn(2, 3, 8, 8).astype(np.float32)

        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.6
        )
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z),
                autoencoder_model=ref_ae,
                diffusion_model=ref_unet,
                scheduler=t_s,
                seg=torch.from_numpy(seg_lat),
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.6
        )
        img_f = f_inf.sample(
            jnp.asarray(z), ae_shim, unet_fn, scheduler=f_s, eta=0.0,
            seg=jnp.asarray(seg_lat),
        )
        assert_close(img_f, img_t, "SPADE latent sample (seg to UNet + decoder)")

        # the seg genuinely matters on both routes: a different seg must
        # change the output (guards against silently dropping the kwarg)
        other = f_inf.sample(
            jnp.asarray(z), ae_shim, unet_fn, scheduler=f_s, eta=0.0,
            seg=jnp.asarray(1.0 - seg_lat),
        )
        assert float(jnp.abs(other - img_f).max()) > 1e-3


# ---------------------------------------------------------------------------
# mode="concat" conditioning through the inferers (reference inferer.py:
# 71-76 base, 389-401 latent [condition concatenated in LATENT space],
# 610-616 ControlNet [the ControlNet sees the CONCATENATED input too])
# ---------------------------------------------------------------------------

class TestConcatConditioningGolden:
    def test_base_inferer_concat_call_and_sample(self):
        from generativemodels_tpu.inferers import DiffusionInferer

        cfg = dict(UNET_IMG_2D, in_channels=2)
        ref_unet, unet_fn = build_unet(cfg, seed=41, latent_shape=(2, 2, 16, 16))
        rs = np.random.RandomState(42)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        cond = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)
        ts = np.array([2, 6])

        t_inf = ref_inf.DiffusionInferer(ref_sched.DDPMScheduler(num_train_timesteps=10))
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x), diffusion_model=ref_unet,
                noise=torch.from_numpy(noise), timesteps=torch.from_numpy(ts),
                condition=torch.from_numpy(cond), mode="concat",
            )
        f_inf = DiffusionInferer(DDPMScheduler(num_train_timesteps=10))
        pred_f = f_inf(
            jnp.asarray(x), unet_fn, jnp.asarray(noise), jnp.asarray(ts),
            condition=jnp.asarray(cond), mode="concat",
        )
        assert_close(pred_f, pred_t, "concat train forward")

        z = rs.randn(2, 1, 16, 16).astype(np.float32)
        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z), diffusion_model=ref_unet,
                scheduler=t_s, conditioning=torch.from_numpy(cond),
                mode="concat", verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        img_f = f_inf.sample(
            jnp.asarray(z), unet_fn, scheduler=f_s,
            conditioning=jnp.asarray(cond), mode="concat", eta=0.0,
        )
        assert_close(img_f, img_t, "concat sample")

    def test_controlnet_inferer_concat_feeds_controlnet_concat_input(self):
        cn_cfg = dict(CN_IMG_2D, in_channels=2)
        unet_cfg = dict(UNET_IMG_2D, in_channels=2)
        ref_cn, cn_fn = build_controlnet(
            cn_cfg, seed=43, latent_shape=(2, 2, 16, 16), cond_shape=(2, 1, 16, 16)
        )
        ref_unet, unet_fn = build_unet(unet_cfg, seed=44, latent_shape=(2, 2, 16, 16))
        rs = np.random.RandomState(45)
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        cond = rs.rand(2, 1, 16, 16).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)
        noise = rs.randn(2, 1, 16, 16).astype(np.float32)
        ts = np.array([1, 7])

        t_inf = ref_inf.ControlNetDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10)
        )
        with torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x), diffusion_model=ref_unet,
                controlnet=ref_cn, noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond),
                condition=torch.from_numpy(cond), mode="concat",
            )
        f_inf = ControlNetDiffusionInferer(DDPMScheduler(num_train_timesteps=10))

        def dm(xx, tt, context=None, down_block_additional_residuals=None,
               mid_block_additional_residual=None):
            return unet_fn(
                xx, tt, context=context,
                down_block_additional_residuals=down_block_additional_residuals,
                mid_block_additional_residual=mid_block_additional_residual,
            )

        pred_f = f_inf(
            jnp.asarray(x), dm, cn_fn, jnp.asarray(noise), jnp.asarray(ts),
            cn_cond=jnp.asarray(cn_cond), condition=jnp.asarray(cond),
            mode="concat",
        )
        assert_close(pred_f, pred_t, "ControlNet concat train forward")

    def test_latent_inferer_concat_in_latent_space(self):
        rs = np.random.RandomState(46)
        eps = rs.randn(2, 3, 8, 8).astype(np.float32)
        ref_ae, ae_shim = build_aekl(AEKL_CFG_2D, seed=47, x_shape=(2, 1, 16, 16), eps=eps)
        unet_cfg = dict(UNET_LAT_2D, in_channels=4, out_channels=3)
        ref_unet, unet_fn = build_unet(unet_cfg, seed=48, latent_shape=(2, 4, 8, 8))

        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        cond_lat = rs.rand(2, 1, 8, 8).astype(np.float32)  # latent-space condition
        noise = rs.randn(2, 3, 8, 8).astype(np.float32)
        ts = np.array([3, 8])

        t_inf = ref_inf.LatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.5
        )
        with patched_randn_like(eps), torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x), autoencoder_model=ref_ae,
                diffusion_model=ref_unet, noise=torch.from_numpy(noise),
                timesteps=torch.from_numpy(ts),
                condition=torch.from_numpy(cond_lat), mode="concat",
            )
        f_inf = LatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.5
        )
        pred_f = f_inf(
            jnp.asarray(x), ae_shim, unet_fn, jnp.asarray(noise),
            jnp.asarray(ts), condition=jnp.asarray(cond_lat), mode="concat",
        )
        assert_close(pred_f, pred_t, "latent concat train forward")


class TestSaveIntermediatesGolden:
    """The `t % intermediate_steps == 0` gating (reference inferer.py:138)
    decides WHICH states a user inspects mid-trajectory — easy to get
    subtly wrong (off-by-one on t vs step index, pre- vs post-update)."""

    def test_sample_intermediates_match(self):
        from generativemodels_tpu.inferers import DiffusionInferer

        ref_unet, unet_fn = build_unet(UNET_IMG_2D, seed=51, latent_shape=(2, 1, 16, 16))
        rs = np.random.RandomState(52)
        z = rs.randn(2, 1, 16, 16).astype(np.float32)

        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(10)
        t_inf = ref_inf.DiffusionInferer(ref_sched.DDPMScheduler(num_train_timesteps=10))
        with torch.no_grad():
            img_t, inter_t = t_inf.sample(
                input_noise=torch.from_numpy(z), diffusion_model=ref_unet,
                scheduler=t_s, save_intermediates=True, intermediate_steps=200,
                verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(10)
        f_inf = DiffusionInferer(DDPMScheduler(num_train_timesteps=10))
        img_f, inter_f = f_inf.sample(
            jnp.asarray(z), unet_fn, scheduler=f_s, save_intermediates=True,
            intermediate_steps=200, eta=0.0,
        )
        assert len(inter_f) == len(inter_t), (len(inter_f), len(inter_t))
        for i, (a, b) in enumerate(zip(inter_f, inter_t)):
            assert_close(a, b, f"intermediate {i}")
        assert_close(img_f, img_t, "final image")


class TestControlNetSPADELatentGolden:
    """The DEEPEST composition the reference supports in one call
    (inferer.py:920-1010): ControlNetLatentDiffusionInferer with a SPADE
    UNet and a SPADE AEKL — cn_cond nearest-interpolated to the latent
    shape and fed to the ControlNet (never seg), seg routed to the UNet
    per step AND to the SPADE decode, all through converted-identical
    nets."""

    def _build(self):
        from generativemodels_tpu.networks.nets import (
            SPADEAutoencoderKL,
            SPADEDiffusionModelUNet,
        )

        rs = np.random.RandomState(61)
        eps = rs.randn(2, 3, 8, 8).astype(np.float32)

        torch.manual_seed(0)
        ref_ae = ref_nets.SPADEAutoencoderKL(**SPADE_AEKL_CFG_2D)
        ref_ae.eval()
        randomize(ref_ae, 62)
        ae = SPADEAutoencoderKL(**SPADE_AEKL_CFG_2D)
        rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
        ae_struct = zc.params_structure(
            ae, jnp.zeros((2, 1, 16, 16)), jnp.zeros((2, 3, 16, 16)), rngs=rngs
        )
        ae_params = zc.convert_spade_autoencoderkl(
            ref_ae.state_dict(), ae_struct,
            num_channels=SPADE_AEKL_CFG_2D["num_channels"],
            num_res_blocks=SPADE_AEKL_CFG_2D["num_res_blocks"],
            attention_levels=SPADE_AEKL_CFG_2D["attention_levels"],
        )
        ae_shim = _EpsSPADEAEKL(
            ae.bind({"params": ae_params}), eps, SPADE_AEKL_CFG_2D["label_nc"]
        )

        ref_unet = ref_nets.SPADEDiffusionModelUNet(**SPADE_UNET_LAT_2D)
        ref_unet.eval()
        randomize(ref_unet, 63)
        unet = SPADEDiffusionModelUNet(**SPADE_UNET_LAT_2D)
        u_struct = zc.params_structure(
            unet, jnp.zeros((2, 3, 8, 8)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 3, 8, 8)),
        )
        u_params = zc.convert_spade_diffusion_model_unet(
            ref_unet.state_dict(), u_struct
        )

        def unet_fn(x, timesteps, context=None, seg=None,
                    down_block_additional_residuals=None,
                    mid_block_additional_residual=None):
            return unet.apply(
                {"params": u_params}, x, timesteps, seg, context=context,
                down_block_additional_residuals=down_block_additional_residuals,
                mid_block_additional_residual=mid_block_additional_residual,
            )

        cn_cfg = dict(CN_LAT_2D, in_channels=3)
        ref_cn, cn_fn = build_controlnet(
            cn_cfg, seed=64, latent_shape=(2, 3, 8, 8), cond_shape=(2, 1, 8, 8)
        )
        return rs, eps, ref_ae, ae_shim, ref_unet, unet_fn, ref_cn, cn_fn

    def test_call_and_sample(self):
        rs, eps, ref_ae, ae_shim, ref_unet, unet_fn, ref_cn, cn_fn = self._build()
        x = rs.rand(2, 1, 16, 16).astype(np.float32)
        seg = (rs.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
        cn_cond = rs.rand(2, 1, 16, 16).astype(np.float32)  # IMAGE res
        noise = rs.randn(2, 3, 8, 8).astype(np.float32)
        ts = np.array([4, 9])

        t_inf = ref_inf.ControlNetLatentDiffusionInferer(
            ref_sched.DDPMScheduler(num_train_timesteps=10), scale_factor=0.8
        )
        with patched_randn_like(eps), torch.no_grad():
            pred_t = t_inf(
                inputs=torch.from_numpy(x), autoencoder_model=ref_ae,
                diffusion_model=ref_unet, controlnet=ref_cn,
                noise=torch.from_numpy(noise), timesteps=torch.from_numpy(ts),
                cn_cond=torch.from_numpy(cn_cond), seg=torch.from_numpy(seg),
            )
        f_inf = ControlNetLatentDiffusionInferer(
            DDPMScheduler(num_train_timesteps=10), scale_factor=0.8
        )
        pred_f = f_inf(
            jnp.asarray(x), ae_shim, unet_fn, cn_fn, jnp.asarray(noise),
            jnp.asarray(ts), cn_cond=jnp.asarray(cn_cond), seg=jnp.asarray(seg),
        )
        assert_close(pred_f, pred_t, "CN+SPADE latent train forward")

        z = rs.randn(2, 3, 8, 8).astype(np.float32)
        t_s = ref_sched.DDIMScheduler(num_train_timesteps=1000)
        t_s.set_timesteps(5)
        with torch.no_grad():
            img_t = t_inf.sample(
                input_noise=torch.from_numpy(z), autoencoder_model=ref_ae,
                diffusion_model=ref_unet, controlnet=ref_cn,
                cn_cond=torch.from_numpy(cn_cond), scheduler=t_s,
                seg=torch.from_numpy(seg), verbose=False,
            )
        f_s = DDIMScheduler(num_train_timesteps=1000)
        f_s.set_timesteps(5)
        img_f = f_inf.sample(
            jnp.asarray(z), ae_shim, unet_fn, cn_fn,
            cn_cond=jnp.asarray(cn_cond), scheduler=f_s, eta=0.0,
            seg=jnp.asarray(seg),
        )
        assert_close(img_f, img_t, "CN+SPADE latent sample")
