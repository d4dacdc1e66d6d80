"""Adversarial + VQ-GAN training-dynamics parity vs the torch reference.

tests/test_training_parity.py proves the plain DDPM MSE loop; these tests
prove the G/D iteration, whose detach semantics and update ordering are
exactly where a fused single-program rewrite can silently diverge:

- AEKL + PatchDiscriminator through the generic fused step
  (engines/trainer.py make_adversarial_train_step) vs a torch loop that
  replicates the reference AdversarialTrainer._iteration
  (generative/engines/trainer.py:185-318) verbatim: G forward -> D(fakes)
  -> (recon + g_adv).backward() -> G step; then D(reals), D(fakes.detach())
  -> d_loss.backward() -> D step. The reference sums recon and the
  adversarial G term unweighted (LOSS = RECONSTRUCTION_LOSS +
  GENERATOR_LOSS, trainer.py:266-270), hence adv_weight=1.0 here.
- VQVAE + PatchDiscriminator through the fused VQ-GAN step
  (recipes/train_vqgan.py make_vqgan_step) vs the reference 2d_vqgan
  tutorial loop shape (tutorials/generative/2d_vqgan/2d_vqgan_tutorial.py:
  214-243) with the same loss composition, asserting the G/D loss
  trajectories AND the EMA-codebook state trajectory
  (generative/networks/layers/vector_quantizer.py:165-183: in-place
  cluster-size/ema_w buffers mutated during forward in train mode).

Determinism: converted-identical init (the zoo converters), identical
injected data batches, and the AEKL reparameterisation eps pinned on both
sides (patched torch.randn_like / an explicit mu + eps*sigma on the flax
side). The VQVAE path draws no randomness at all.

Optimizer-math note (same as test_training_parity.py): torch.optim.Adam
and optax.adam are algebraically identical; only accumulation order
differs. Measured drift at these configs: step-0 losses agree to ~1e-6,
max relative divergence by step 50 is ~2e-4 (adversarial) / ~1e-4
(VQ-GAN); rtol=2e-3 leaves ~10x headroom. The EMA codebook stays within
1e-4 absolute after 50 updates.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from generativemodels_tpu.engines import (  # noqa: E402
    AdversarialTrainState,
    make_adversarial_train_step,
)
from generativemodels_tpu.losses import PatchAdversarialLoss  # noqa: E402
from generativemodels_tpu.networks import zoo_convert as zc  # noqa: E402
from generativemodels_tpu.networks.nets import (  # noqa: E402
    VQVAE,
    AutoencoderKL,
    PatchDiscriminator,
)
from generativemodels_tpu.utils import AdversarialKeys  # noqa: E402

from .ref_loader import load_reference_losses, load_reference_nets

ref_nets = load_reference_nets()
ref_losses = load_reference_losses()

pytestmark = pytest.mark.skipif(
    ref_nets is None or ref_losses is None,
    reason="torch reference could not be imported",
)

STEPS = 50
BATCH = 4
SIZE = 16
LR = 1e-4

AEKL_CFG = dict(
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

DISC_CFG = dict(
    spatial_dims=2,
    num_layers_d=2,
    num_channels=8,
    in_channels=1,
    out_channels=1,
    norm="INSTANCE",
)

VQ_CFG = dict(
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
)  # 16x16 -> 4x4 latent


def _deep_copy(tree):
    """Converted trees may hold numpy VIEWS of live torch parameter storage
    (1-D norm/bias leaves pass through untransposed), and jnp.asarray on the
    CPU backend can be zero-copy — so the torch training loop would mutate
    the 'converted init' before the flax loop reads it. Force real copies."""
    return jax.tree.map(lambda a: jnp.array(np.array(a)), tree)


def _build_discriminators(seed: int):
    torch.manual_seed(seed)
    ref_d = ref_nets.PatchDiscriminator(**DISC_CFG)
    disc = PatchDiscriminator(**DISC_CFG)
    d_struct = zc.params_structure(disc, jnp.zeros((BATCH, 1, SIZE, SIZE)))
    d_params, _ = zc.convert_patch_discriminator(ref_d.state_dict(), d_struct)
    return ref_d, disc, _deep_copy(d_params)


@pytest.mark.slow
def test_adversarial_gd_loss_trajectories_match_reference():
    """50 G/D iterations: AEKL generator vs reference _iteration semantics."""
    rs = np.random.RandomState(0)
    data = rs.rand(STEPS, BATCH, 1, SIZE, SIZE).astype(np.float32)
    eps_stream = rs.randn(STEPS, BATCH, AEKL_CFG["latent_channels"], 8, 8).astype(
        np.float32
    )

    torch.manual_seed(0)
    ref_g = ref_nets.AutoencoderKL(**AEKL_CFG)
    ref_d, disc, d_params = _build_discriminators(seed=1)

    model = AutoencoderKL(**AEKL_CFG)
    g_struct = zc.params_structure(
        model,
        jnp.zeros((BATCH, 1, SIZE, SIZE)),
        rngs={"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    )
    g_params = zc.convert_autoencoderkl(
        ref_g.state_dict(),
        g_struct,
        num_channels=AEKL_CFG["num_channels"],
        num_res_blocks=AEKL_CFG["num_res_blocks"],
        attention_levels=AEKL_CFG["attention_levels"],
        with_encoder_nonlocal_attn=False,
        with_decoder_nonlocal_attn=False,
    )
    g_params = _deep_copy(g_params)

    # ---- torch side: the reference _iteration, verbatim semantics ---------
    ref_adv = ref_losses.PatchAdversarialLoss(criterion="least_squares")
    opt_g = torch.optim.Adam(ref_g.parameters(), lr=LR)
    opt_d = torch.optim.Adam(ref_d.parameters(), lr=LR)
    ref_g.train()
    ref_d.train()
    torch_traj = {"recon": [], "g_adv": [], "d": []}
    orig_randn_like = torch.randn_like
    try:
        for s in range(STEPS):
            x = torch.from_numpy(data[s])
            eps = torch.from_numpy(eps_stream[s])
            # generator phase (trainer.py:258-281)
            opt_g.zero_grad()
            torch.randn_like = lambda t, _e=eps: _e.to(t.dtype)
            fakes, _, _ = ref_g(x)
            torch.randn_like = orig_randn_like
            fake_logits = ref_d(fakes.float().contiguous())[-1]
            recon_loss = torch.nn.functional.l1_loss(fakes, x).mean()
            g_adv = ref_adv(
                fake_logits, target_is_real=True, for_discriminator=False
            ).mean()
            (recon_loss + g_adv).backward()
            opt_g.step()
            # discriminator phase (trainer.py:284-318)
            opt_d.zero_grad()
            real_logits = ref_d(x.contiguous().detach())[-1]
            fake_logits_d = ref_d(fakes.contiguous().detach())[-1]
            d_loss = (
                0.5
                * (
                    ref_adv(real_logits, target_is_real=True, for_discriminator=True)
                    + ref_adv(
                        fake_logits_d, target_is_real=False, for_discriminator=True
                    )
                ).mean()
            )
            d_loss.backward()
            opt_d.step()
            torch_traj["recon"].append(recon_loss.item())
            torch_traj["g_adv"].append(g_adv.item())
            torch_traj["d"].append(d_loss.item())
    finally:
        torch.randn_like = orig_randn_like

    # ---- flax side: the fused G+D step -------------------------------------
    adv = PatchAdversarialLoss(criterion="least_squares")

    def g_forward(params, model_state, inputs, rng):
        img, eps = inputs
        z_mu, z_sigma = model.apply({"params": params}, img, method="encode")
        recon = model.apply({"params": params}, z_mu + eps * z_sigma, method="decode")
        return recon, model_state

    def d_forward(params, model_state, images):
        if isinstance(images, tuple):
            images = images[0]
        return disc.apply({"params": params}, images)[-1], model_state

    g_tx, d_tx = optax.adam(LR), optax.adam(LR)
    state = AdversarialTrainState(
        g_params=g_params,
        g_model_state={},
        g_opt_state=g_tx.init(g_params),
        d_params=d_params,
        d_model_state={},
        d_opt_state=d_tx.init(d_params),
        step=jnp.asarray(0),
    )
    step = make_adversarial_train_step(
        g_forward,
        d_forward,
        g_tx,
        d_tx,
        recon_loss_fn=lambda f, t: jnp.mean(jnp.abs(f - t)),
        g_loss_fn=lambda lg: adv(lg, target_is_real=True, for_discriminator=False),
        d_loss_fn=lambda rl, fl: 0.5
        * (
            adv(rl, target_is_real=True, for_discriminator=True)
            + adv(fl, target_is_real=False, for_discriminator=True)
        ),
        adv_weight=1.0,  # reference sums recon + g_loss unweighted (:266-270)
        donate=False,
    )
    jax_traj = {"recon": [], "g_adv": [], "d": []}
    dummy_key = jax.random.PRNGKey(0)
    for s in range(STEPS):
        img = jnp.asarray(data[s])
        state, out = step(state, (img, jnp.asarray(eps_stream[s])), img, dummy_key)
        jax_traj["recon"].append(float(out[AdversarialKeys.RECONSTRUCTION_LOSS]))
        jax_traj["g_adv"].append(float(out[AdversarialKeys.GENERATOR_LOSS]))
        jax_traj["d"].append(float(out[AdversarialKeys.DISCRIMINATOR_LOSS]))

    for k in ("recon", "g_adv", "d"):
        np.testing.assert_allclose(
            np.asarray(jax_traj[k]),
            np.asarray(torch_traj[k]),
            rtol=2e-3,
            atol=2e-4,
            err_msg=f"{k} trajectory diverged",
        )
    # the loop actually learns: reconstruction improves over the run
    recon = np.asarray(jax_traj["recon"])
    assert recon[-10:].mean() < recon[:10].mean()


@pytest.mark.slow
def test_vqgan_ema_codebook_trajectory_matches_reference():
    """50 VQ-GAN iterations: G/D losses + the EMA codebook state itself."""
    from generativemodels_tpu.recipes import VQGANState, make_vqgan_step

    ADV_W, FM_W, QUANT_W = 0.1, 1.0, 1.0
    rs = np.random.RandomState(7)
    data = rs.rand(STEPS, BATCH, 1, SIZE, SIZE).astype(np.float32)

    torch.manual_seed(0)
    ref_vq = ref_nets.VQVAE(**VQ_CFG)
    ref_d, disc, d_params = _build_discriminators(seed=1)

    vqvae = VQVAE(**VQ_CFG)
    g_struct = zc.params_structure(vqvae, jnp.zeros((BATCH, 1, SIZE, SIZE)))
    g_params, codebook = zc.convert_vqvae(
        ref_vq.state_dict(),
        g_struct,
        num_channels=VQ_CFG["num_channels"],
        num_res_layers=VQ_CFG["num_res_layers"],
    )
    g_params = _deep_copy(g_params)
    codebook = _deep_copy(codebook)

    # ---- torch side: 2d_vqgan tutorial loop shape, make_vqgan_step's
    # exact loss composition (recon + q + adv_w*(g_adv + fm_w*fm); D on
    # detached fakes AFTER the G update) ------------------------------------
    ref_adv = ref_losses.PatchAdversarialLoss(criterion="least_squares")
    opt_g = torch.optim.Adam(ref_vq.parameters(), lr=LR)
    opt_d = torch.optim.Adam(ref_d.parameters(), lr=LR)
    ref_vq.train()
    ref_d.train()
    torch_traj = {"g": [], "d": []}
    for s in range(STEPS):
        x = torch.from_numpy(data[s])
        real_outs = ref_d(x)
        real_logits, real_feats = real_outs[-1], real_outs[:-1]
        opt_g.zero_grad()
        recon, q_loss = ref_vq(x)
        fake_outs = ref_d(recon)
        fake_logits, fake_feats = fake_outs[-1], fake_outs[:-1]
        recon_l1 = torch.nn.functional.l1_loss(recon, x)
        g_adv = ref_adv(fake_logits, target_is_real=True, for_discriminator=False)
        fm = torch.mean(
            torch.stack(
                [
                    torch.nn.functional.l1_loss(r.detach(), f)
                    for r, f in zip(real_feats, fake_feats)
                ]
            )
        )
        g_total = recon_l1 + QUANT_W * q_loss + ADV_W * (g_adv + FM_W * fm)
        g_total.backward()
        opt_g.step()
        opt_d.zero_grad()
        fake_logits_d = ref_d(recon.contiguous().detach())[-1]
        real_logits_d = ref_d(x)[-1]
        d_total = 0.5 * (
            ref_adv(real_logits_d, target_is_real=True, for_discriminator=True)
            + ref_adv(fake_logits_d, target_is_real=False, for_discriminator=True)
        )
        d_total.backward()
        opt_d.step()
        torch_traj["g"].append(g_total.item())
        torch_traj["d"].append(d_total.item())

    # ---- flax side: the fused VQ-GAN step ----------------------------------
    g_tx, d_tx = optax.adam(LR), optax.adam(LR)
    state = VQGANState(
        g_params=g_params,
        codebook=codebook,
        g_opt_state=g_tx.init(g_params),
        d_params=d_params,
        d_opt_state=d_tx.init(d_params),
        step=jnp.asarray(0),
    )
    step = make_vqgan_step(
        vqvae, disc, g_tx, d_tx, adv_weight=ADV_W, fm_weight=FM_W, quant_weight=QUANT_W
    )
    jax_traj = {"g": [], "d": []}
    for s in range(STEPS):
        state, out = step(state, jnp.asarray(data[s]))
        jax_traj["g"].append(float(out["g_total"]))
        jax_traj["d"].append(float(out["d_total"]))

    for k in ("g", "d"):
        np.testing.assert_allclose(
            np.asarray(jax_traj[k]),
            np.asarray(torch_traj[k]),
            rtol=2e-3,
            atol=2e-4,
            err_msg=f"{k} trajectory diverged",
        )

    # the EMA codebook state itself, after 50 in-training updates
    # (vector_quantizer.py:165-183 buffers vs the flax "codebook" collection)
    q = ref_vq.quantizer.quantizer
    flat = state.codebook
    while isinstance(flat, dict) and "embedding" not in flat:
        flat = next(iter(flat.values()))
    np.testing.assert_allclose(
        np.asarray(flat["embedding"]),
        q.embedding.weight.detach().numpy(),
        rtol=1e-3,
        atol=1e-4,
        err_msg="EMA codebook embedding diverged",
    )
    np.testing.assert_allclose(
        np.asarray(flat["ema_cluster_size"]),
        q.ema_cluster_size.detach().numpy(),
        rtol=1e-3,
        atol=1e-4,
        err_msg="EMA cluster sizes diverged",
    )
    np.testing.assert_allclose(
        np.asarray(flat["ema_w"]),
        q.ema_w.detach().numpy(),
        rtol=1e-3,
        atol=1e-4,
        err_msg="EMA accumulator diverged",
    )
