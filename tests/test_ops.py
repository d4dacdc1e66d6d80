"""Tests for ops: attention paths (einsum vs Pallas flash) and embeddings."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generativemodels_tpu.ops import dot_product_attention, flash_attention, get_timestep_embedding


class TestTimestepEmbedding:
    def test_shape_and_layout(self):
        emb = get_timestep_embedding(jnp.array([0, 10, 100]), 64)
        assert emb.shape == (3, 64)
        # t=0: cos part == 1, sin part == 0
        np.testing.assert_allclose(np.asarray(emb[0, :32]), 1.0)
        np.testing.assert_allclose(np.asarray(emb[0, 32:]), 0.0)

    def test_odd_dim_padded(self):
        emb = get_timestep_embedding(jnp.array([3]), 7)
        assert emb.shape == (1, 7)
        assert float(emb[0, -1]) == 0.0

    def test_requires_1d(self):
        with pytest.raises(ValueError):
            get_timestep_embedding(jnp.zeros((2, 2)), 8)


class TestAttention:
    def _qkv(self, b=2, sq=64, sk=64, c=32, seed=0):
        rng = np.random.RandomState(seed)
        return (
            jnp.asarray(rng.standard_normal((b, sq, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((b, sk, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((b, sk, c)).astype(np.float32)),
        )

    def test_einsum_self_attention_matches_naive(self):
        q, k, v = self._qkv()
        out = dot_product_attention(q, k, v, num_heads=1, use_flash=False)
        scores = jnp.einsum("bqc,bkc->bqk", q, k) / np.sqrt(32)
        expected = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(scores, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("heads", [1, 4])
    def test_flash_matches_einsum(self, causal, heads):
        q, k, v = self._qkv(b=1, sq=160, sk=160, c=32)
        ref = dot_product_attention(q, k, v, num_heads=heads, causal=causal, use_flash=False)
        out = dot_product_attention(q, k, v, num_heads=heads, causal=causal, use_flash=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_flash_cross_attention_unequal_lengths(self):
        q, k, v = self._qkv(b=1, sq=140, sk=77, c=32)
        ref = dot_product_attention(q, k, v, num_heads=2, use_flash=False)
        out = dot_product_attention(q, k, v, num_heads=2, use_flash=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_flash_kernel_direct(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        scale = 1 / 8.0
        out = flash_attention(q, k, v, scale=scale, interpret=True)
        scores = jnp.einsum("bqc,bkc->bqk", q, k) * scale
        expected = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(scores, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-4, atol=2e-5)

    def test_flash_nomax_matches_online_max(self):
        """Max-free clamped softmax (default) vs the running-max kernel.

        no_max drops the per-tile row-max + alpha rescale; within the
        clamp envelope ([-120, 80] log2-domain scores) both compute the
        exact same softmax, fwd and bwd.
        """
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.standard_normal((2, 320, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 320, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 320, 64)).astype(np.float32))
        scale = 1 / 8.0

        def loss(no_max):
            def f(q, k, v):
                out = flash_attention(
                    q, k, v, scale=scale, interpret=True, no_max=no_max
                )
                return jnp.sum(out ** 2)
            return jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)

        (l0, g0), (l1, g1) = loss(False), loss(True)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
        # extreme logits (beyond the ±55-natural clamp) still finite and
        # row-normalised — weights saturate instead of overflowing
        out = flash_attention(
            q * 100.0, k, v, scale=scale, interpret=True, no_max=True
        )
        assert bool(jnp.all(jnp.isfinite(out)))

    @pytest.mark.parametrize("ilv", [(1, 2), (2, 1), (2, 2)])
    @pytest.mark.parametrize("causal", [False, True])
    def test_flash_interleaved_matches_monolithic(self, ilv, causal):
        """Interleaved no_max tiles (MXU/VPU overlap split) are exact.

        The interleave only reorders additive accumulations and sub-tiles
        the masks; fwd and grads must match the monolithic kernel to f32
        accumulation-order tolerance. Uses sk not divisible by block_k so
        the kv-bound mask path is exercised per sub-chunk.
        """
        rng = np.random.RandomState(11)
        sk = 256 if causal else 200  # causal: self-attn; else: ragged kv bound
        q2 = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        k2 = jnp.asarray(rng.standard_normal((2, sk, 64)).astype(np.float32))
        v2 = jnp.asarray(rng.standard_normal((2, sk, 64)).astype(np.float32))
        scale = 1 / 8.0

        def loss(ilv):
            def f(q, k, v):
                out = flash_attention(
                    q, k, v, scale=scale, causal=causal, interpret=True,
                    no_max=True, block_q=128, block_k=128, ilv=ilv,
                )
                return jnp.sum(out ** 2)
            return jax.value_and_grad(f, argnums=(0, 1, 2))(q2, k2, v2)

        (l0, g0) = loss((1, 1))
        (l1, g1) = loss(ilv)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_flash_bf16_matches_einsum(self):
        """bf16 inputs take the bf16-MXU matmul path; parity at bf16 tolerance."""
        q, k, v = self._qkv(b=1, sq=160, sk=160, c=32)
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        ref = dot_product_attention(q, k, v, num_heads=2, use_flash=False)
        out = dot_product_attention(q, k, v, num_heads=2, use_flash=True)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(out, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_flash_bf16_grads_match_einsum(self):
        q, k, v = self._qkv(b=1, sq=160, sk=160, c=32)
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))

        def loss(use_flash):
            def f(q, k, v):
                out = dot_product_attention(q, k, v, num_heads=2, use_flash=use_flash)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        for a, b in zip(loss(True), loss(False)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=6e-2, atol=6e-2,
            )

    def test_upcast_matches(self):
        q, k, v = self._qkv()
        a = dot_product_attention(q, k, v, num_heads=2, use_flash=False, upcast=True)
        b = dot_product_attention(q, k, v, num_heads=2, use_flash=False, upcast=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_flash_upcast_forces_f32_operands(self):
        """upcast=True on the flash path must match the einsum-upcast
        result to f32-class tolerance even for bf16 inputs (reference
        upcast_attention operand contract, ADVICE round 2)."""
        q, k, v = (x.astype(jnp.bfloat16) for x in self._qkv())
        flash = dot_product_attention(
            q, k, v, num_heads=2, use_flash=True, upcast=True
        ).astype(np.float32)
        exact = dot_product_attention(
            q, k, v, num_heads=2, use_flash=False, upcast=True
        ).astype(np.float32)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(exact), rtol=2e-2, atol=2e-2)


class TestFlashAttentionGradients:
    def _qkv(self, b=1, sq=160, sk=160, c=32, seed=0):
        rng = np.random.RandomState(seed)
        return (
            jnp.asarray(rng.standard_normal((b, sq, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((b, sk, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((b, sk, c)).astype(np.float32)),
        )

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_einsum(self, causal):
        q, k, v = self._qkv()

        def loss_flash(q, k, v):
            out = dot_product_attention(q, k, v, num_heads=2, causal=causal, use_flash=True)
            return jnp.sum(out * jnp.cos(out))

        def loss_einsum(q, k, v):
            out = dot_product_attention(q, k, v, num_heads=2, causal=causal, use_flash=False)
            return jnp.sum(out * jnp.cos(out))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        ge = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)

    def test_cross_attention_grads(self):
        q, k, v = self._qkv(sq=140, sk=77)

        def loss(use_flash):
            def f(q, k, v):
                out = dot_product_attention(q, k, v, num_heads=1, use_flash=use_flash)
                return jnp.sum(out**2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        gf, ge = loss(True), loss(False)
        for a, b in zip(gf, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


class TestTimestepEmbeddingGoldenParity:
    def test_matches_reference_formula(self):
        """Bit-level comparison with the reference's torch implementation
        (diffusion_model_unet.py:461-485)."""
        import math

        import torch

        t = torch.tensor([0, 7, 250, 999])
        dim, max_period = 64, 10000
        half = dim // 2
        exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
        freqs = torch.exp(exponent / half)
        args = t[:, None].float() * freqs[None, :]
        expected = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()

        ours = get_timestep_embedding(jnp.asarray([0, 7, 250, 999]), dim)
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-5, atol=2e-6)


class TestConv3DDecomposition:
    """The depth-tap 2D decomposition must match the native 3D lowering.

    TPU auto-enables decompose_3d (benchmarks/results_conv3d_probe.json:
    3.6x at 128^3 C=32); parity here runs both paths explicitly on CPU.
    """

    def _run(self, *, size=(10, 12, 14), cin=6, cout=8, kernel=3, stride=1,
             padding=1, use_bias=True, dtype=None):
        from generativemodels_tpu.networks.blocks.convolutions import ConvND

        x = jax.random.normal(jax.random.PRNGKey(0), (2, *size, cin))
        if dtype is not None:
            x = x.astype(dtype)
        kwargs = dict(
            spatial_dims=3, features=cout, kernel_size=kernel, strides=stride,
            padding=padding, use_bias=use_bias, dtype=dtype,
        )
        native = ConvND(**kwargs, decompose_3d=False)
        fast = ConvND(**kwargs, decompose_3d=True)
        variables = native.init(jax.random.PRNGKey(1), x)
        a = native.apply(variables, x)
        b = fast.apply(variables, x)  # identical param tree by construction
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-5,
        )

    def test_k3_s1_p1(self):
        self._run()

    def test_k3_s2_p1(self):
        self._run(stride=2)

    def test_k1(self):
        self._run(kernel=1, padding=0)

    def test_k4_s2_p1_even(self):
        # VQVAE-style downsample arithmetic (k=4, s=2) on even sizes
        self._run(size=(8, 8, 8), kernel=4, stride=2, padding=1)

    def test_no_bias(self):
        self._run(use_bias=False)

    def test_grads_match(self):
        from generativemodels_tpu.networks.blocks.convolutions import ConvND

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 6, 4))
        kwargs = dict(spatial_dims=3, features=5, kernel_size=3, strides=1, padding=1)
        native = ConvND(**kwargs, decompose_3d=False)
        fast = ConvND(**kwargs, decompose_3d=True)
        variables = native.init(jax.random.PRNGKey(1), x)

        def loss(mod):
            def f(v, xx):
                return jnp.sum(mod.apply(v, xx) ** 2)
            return jax.grad(f, argnums=(0, 1))(variables, x)

        ga, gb = loss(native), loss(fast)
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


class TestFusedUpsampleConv:
    """`nearest_upsample=True` fuses upsample+conv3^3 into a transposed
    conv on the decomposed path (convolutions._upsample_conv3d); it must
    match upsample_nearest + native conv exactly (f32).
    """

    def _run(self, *, size=(6, 5, 7), cin=4, cout=6, use_bias=True):
        from generativemodels_tpu.networks.blocks.convolutions import ConvND

        x = jax.random.normal(jax.random.PRNGKey(0), (2, *size, cin))
        kwargs = dict(
            spatial_dims=3, features=cout, kernel_size=3, strides=1,
            padding=1, use_bias=use_bias, nearest_upsample=True,
        )
        ref = ConvND(**kwargs, decompose_3d=False)  # upsample + native conv
        fused = ConvND(**kwargs, decompose_3d=True)  # _upsample_conv3d
        variables = ref.init(jax.random.PRNGKey(1), x)
        a = ref.apply(variables, x)
        b = fused.apply(variables, x)
        assert a.shape == b.shape == (2, *(2 * s for s in size), cout)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-5,
        )

    def test_fused_matches_upsample_then_conv(self):
        self._run()

    def test_no_bias(self):
        self._run(use_bias=False)

    def test_grads_match(self):
        from generativemodels_tpu.networks.blocks.convolutions import ConvND

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 3))
        kwargs = dict(
            spatial_dims=3, features=5, kernel_size=3, strides=1, padding=1,
            nearest_upsample=True,
        )
        ref = ConvND(**kwargs, decompose_3d=False)
        fused = ConvND(**kwargs, decompose_3d=True)
        variables = ref.init(jax.random.PRNGKey(1), x)

        def grads(mod):
            def f(v, xx):
                return jnp.sum(mod.apply(v, xx) ** 2)

            return jax.grad(f, argnums=(0, 1))(variables, x)

        ga, gb = grads(ref), grads(fused)
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_2d_falls_back_to_upsample_then_conv(self):
        # nearest_upsample on 2D (no fused path) must still upsample
        from generativemodels_tpu.networks.blocks.convolutions import (
            ConvND,
            upsample_nearest,
        )

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6, 3))
        mod = ConvND(spatial_dims=2, features=4, kernel_size=3, padding=1,
                     nearest_upsample=True)
        v = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(v, x)
        ref = ConvND(spatial_dims=2, features=4, kernel_size=3, padding=1)
        out_ref = ref.apply(v, upsample_nearest(x, 2))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_ref), rtol=1e-6, atol=1e-6
        )


class TestConv3DDecompositionEndToEnd:
    def test_full_3d_unet_forward_parity(self):
        """Whole 3D UNet forward: decomposed vs native lowering.

        Catches integration regressions the op-level grid can't (string
        paddings, transposed convs, skip-connection 1x1x1s) — the env
        override flips every eligible ConvND in the model at once.
        """
        import os

        from generativemodels_tpu.networks.nets import DiffusionModelUNet

        model = DiffusionModelUNet(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 16), attention_levels=(False, True),
            norm_num_groups=8, num_head_channels=16,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 8, 8, 8))
        t = jnp.array([3])
        v = model.init(jax.random.PRNGKey(1), x, t)

        def run(mode):
            os.environ["GMTPU_DECOMPOSE_3D"] = mode
            try:
                return model.apply(v, x, t)
            finally:
                os.environ.pop("GMTPU_DECOMPOSE_3D", None)

        a, b = run("never"), run("always")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


class TestFlashDispatchEnvelope:
    """Which attention path runs at which shapes (VERDICT round-2 weak 5/8).

    Zoo-bundle attention (UNet(256,512,768): head dims 512/768) stays on
    the fused-XLA einsum path — measured slower on the Pallas kernel at
    those widths (benchmarks/results_attention.json "bundle_*" rows);
    the flagship 2D (seq 1024 d=256) and 3D (seq 4096+ d=64) configs run
    on the kernel.
    """

    def test_dispatch_table(self):
        from generativemodels_tpu.ops.attention import resolve_use_flash

        on = dict(on_tpu=True)
        # flagship configs hit the Pallas kernel
        assert resolve_use_flash(1024, 256, **on)       # 2D tutorial lvl1
        assert resolve_use_flash(4096, 64, **on)        # 3D 64^3
        assert resolve_use_flash(32768, 64, **on)       # 3D 128^3
        # zoo-bundle wide heads -> einsum (measured faster there)
        assert not resolve_use_flash(1408, 512, **on)   # brain bundle lvl1
        assert not resolve_use_flash(175, 768, **on)    # brain bundle lvl2
        assert not resolve_use_flash(1024, 512, **on)   # CXR bundle lvl1
        # short sequences -> einsum; non-TPU -> einsum
        assert not resolve_use_flash(256, 256, **on)
        assert not resolve_use_flash(4096, 64, on_tpu=False)
        # masked (KV-cache decode) always einsum, even if forced
        assert not resolve_use_flash(4096, 64, use_flash=True, has_mask=True, **on)
        # explicit force wins otherwise
        assert resolve_use_flash(256, 512, use_flash=True, **on)
        assert not resolve_use_flash(32768, 64, use_flash=False, **on)

    def test_block_and_interleave_table(self):
        """Pin the swept (block_q, block_k, ilv) choices per shape class
        (benchmarks/results_flash_sweep.json + results_flash_ilv.json):
        long narrow-head tiles interleave (2,2) at bk=2048; wide heads
        and short sequences stay monolithic (interleave measured 5-10x
        slower at d>=128)."""
        from generativemodels_tpu.ops.attention import _pick_blocks

        assert _pick_blocks(32768, 64) == (1024, 2048, (2, 2))   # 3D 128^3
        assert _pick_blocks(8192, 64) == (1024, 2048, (2, 2))
        assert _pick_blocks(4096, 64) == (512, 1024, (1, 1))     # 3D 64^3
        assert _pick_blocks(1024, 256) == (256, 1024, (1, 1))    # 2D lvl1
        assert _pick_blocks(32768, 128) == (256, 1024, (1, 1))   # wide head

    def test_wide_head_kernel_still_correct(self):
        """d=512 through the kernel (forced) matches einsum — the gate is
        a performance choice, not a correctness one."""
        rng = np.random.RandomState(0)
        q, k, v = (jnp.asarray(rng.standard_normal((1, 256, 512)).astype(np.float32))
                   for _ in range(3))
        a = dot_product_attention(q, k, v, num_heads=1, use_flash=True)
        b = dot_product_attention(q, k, v, num_heads=1, use_flash=False, upcast=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


class TestFusedNormSiluConv3d:
    """Fused GN/SiLU/conv/residual Pallas kernel (ops/fused_conv.py),
    interpret mode. Reference op chain: generative/networks/nets/
    diffusion_model_unet.py:700-741 (ResnetBlock.forward)."""

    def _setup(self, cin=16, cout=16, g=4, d=6, hw=8, seed=0):
        rng = np.random.RandomState(seed)
        mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        return (mk(1, d, hw, hw, cin), mk(3, 3, 3, cin, cout) * 0.1,
                mk(cin), mk(cin), mk(cout), mk(1, d, hw, hw, cout))

    def test_matches_xla_chain(self):
        from generativemodels_tpu.ops.fused_conv import (
            _xla_equivalent, fold_groupnorm_affine, fused_norm_silu_conv3d)

        x, w, gamma, beta, bias, res = self._setup()
        scale, shift = fold_groupnorm_affine(x, gamma, beta, 4)
        out = fused_norm_silu_conv3d(
            x, w, scale, shift, bias=bias, residual=res, interpret=True)
        exp = _xla_equivalent(x, w, scale, shift, bias, res, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)

    def test_temb_folded_into_affine(self):
        """normalize(x + temb) == x*scale + shift with the folded stats."""
        from generativemodels_tpu.ops.fused_conv import fold_groupnorm_affine

        x, _, gamma, beta, _, _ = self._setup()
        temb = jnp.asarray(np.random.RandomState(3).standard_normal((1, 16)).astype(np.float32))
        scale, shift = fold_groupnorm_affine(x, gamma, beta, 4, temb=temb)
        got = x * scale[:, None, None, None, :] + shift[:, None, None, None, :]
        xt = x + temb[:, None, None, None, :]
        xg = xt.reshape(1, 6, 8, 8, 4, 4)
        mean = xg.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
        exp = ((xg - mean) / jnp.sqrt(var + 1e-6)).reshape(x.shape) * gamma + beta
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)

    def test_custom_vjp_matches_xla_grad(self):
        from generativemodels_tpu.ops.fused_conv import (
            _xla_equivalent, fold_groupnorm_affine, fused_norm_silu_conv3d)

        x, w, gamma, beta, bias, res = self._setup()

        def loss(fn):
            def f(x, w):
                s, t = fold_groupnorm_affine(x, gamma, beta, 4)
                return jnp.sum(fn(x, w, s, t) ** 2)
            return jax.grad(f, argnums=(0, 1))(x, w)

        gf = loss(lambda x, w, s, t: fused_norm_silu_conv3d(
            x, w, s, t, bias=bias, residual=res, interpret=True))
        ge = loss(lambda x, w, s, t: _xla_equivalent(x, w, s, t, bias, res, True))
        for a, b in zip(gf, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)

    def test_resblock_fused_path_parity(self, monkeypatch):
        """GMTPU_FUSED_RESBLOCK=1: identical param tree and matching
        forward on a perturbed-params ResnetBlock."""
        from generativemodels_tpu.networks.nets.diffusion_model_unet import ResnetBlock

        block = ResnetBlock(
            spatial_dims=3, in_channels=8, out_channels=16, temb_channels=16,
            norm_num_groups=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 6, 8))
        emb = jax.random.normal(jax.random.PRNGKey(1), (1, 16))

        monkeypatch.delenv("GMTPU_FUSED_RESBLOCK", raising=False)
        v = block.init(jax.random.PRNGKey(2), x, emb)
        leaves, treedef = jax.tree_util.tree_flatten(v)
        rngs = jax.random.split(jax.random.PRNGKey(9), len(leaves))
        leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, rngs)]
        v = jax.tree_util.tree_unflatten(treedef, leaves)
        out_std = block.apply(v, x, emb)

        monkeypatch.setenv("GMTPU_FUSED_RESBLOCK", "1")
        v_fused = block.init(jax.random.PRNGKey(2), x, emb)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(v_fused))
        out_fused = block.apply(v, x, emb)
        assert float(jnp.max(jnp.abs(out_std))) > 0
        np.testing.assert_allclose(
            np.asarray(out_std), np.asarray(out_fused), atol=2e-5)


class TestFlashIlvEnv:
    def test_env_knob_and_malformed_values(self, monkeypatch):
        """GMTPU_FLASH_ILV overrides dispatch; malformed/zero degrade to off."""
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.standard_normal((1, 1024, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 1024, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 1024, 64)).astype(np.float32))
        ref = dot_product_attention(q, k, v, num_heads=1, use_flash=False)
        for val in ["2,2", "4", "", "0,2", "banana"]:
            monkeypatch.setenv("GMTPU_FLASH_ILV", val)
            out = dot_product_attention(q, k, v, num_heads=1, use_flash=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5,
                err_msg=f"GMTPU_FLASH_ILV={val!r}",
            )


class TestFlashFusedBackward:
    """GMTPU_FLASH_FUSED_BWD=1 routes the backward through one fused
    Pallas kernel (dq emitted as per-k-tile partial slabs, summed outside;
    dk/dv accumulated exactly as the split kernel). Must match the split
    backward bit-for-bit-ish in every dispatch regime."""

    def _grads(self, q, k, v, scale, causal, fused, monkeypatch,
               block_q=128, block_k=128):
        from generativemodels_tpu.ops.flash_attention import flash_attention

        monkeypatch.setenv("GMTPU_FLASH_FUSED_BWD", "1" if fused else "0")

        def f(q, k, v):
            out = flash_attention(
                q, k, v, scale=scale, causal=causal, interpret=True,
                block_q=block_q, block_k=block_k,
            )
            return jnp.sum(out ** 2)

        return jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    def test_fused_matches_split_multi_ktile(self, causal, monkeypatch):
        rng = np.random.RandomState(11)
        # sq=256, sk=512 with 128-blocks -> 4 k-tiles, 2 q-tiles: the dq
        # partial-slab sum and the causal dead-tile zeroing both engage
        q = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 256 if causal else 512, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 256 if causal else 512, 64)).astype(np.float32))
        (l0, g0) = self._grads(q, k, v, 1 / 8.0, causal, False, monkeypatch)
        (l1, g1) = self._grads(q, k, v, 1 / 8.0, causal, True, monkeypatch)
        np.testing.assert_allclose(float(l0[0] if isinstance(l0, tuple) else l0),
                                   float(l1[0] if isinstance(l1, tuple) else l1),
                                   rtol=1e-6)
        for a, b in zip(g0[1] if isinstance(g0, tuple) and len(g0) == 2 else g0,
                        g1[1] if isinstance(g1, tuple) and len(g1) == 2 else g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_ragged_kv(self, monkeypatch):
        rng = np.random.RandomState(12)
        # kv_len 320 with block_k 128 -> padded final tile (mask path)
        q = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 320, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 320, 64)).astype(np.float32))
        _, g0 = self._grads(q, k, v, 1 / 8.0, False, False, monkeypatch)
        _, g1 = self._grads(q, k, v, 1 / 8.0, False, True, monkeypatch)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_block_cap_repad(self, monkeypatch):
        """When the fused backward picks smaller blocks than the forward
        (VMEM cap / GMTPU_FLASH_FUSED_BWD_BLOCKS), the q/k/v/do/lse/delta
        operands are re-padded to the fused grid; grads must be unchanged."""
        rng = np.random.RandomState(14)
        q = jnp.asarray(rng.standard_normal((2, 200, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 200, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 200, 64)).astype(np.float32))
        # fwd blocks 256 -> sq_p=256; fused override 128 -> fsq_p=256 via
        # two 128-tiles and the ragged final k-tile masked
        monkeypatch.setenv("GMTPU_FLASH_FUSED_BWD_BLOCKS", "128,128")
        _, g1 = self._grads(q, k, v, 1 / 8.0, False, True, monkeypatch,
                            block_q=256, block_k=256)
        monkeypatch.delenv("GMTPU_FLASH_FUSED_BWD_BLOCKS")
        _, g0 = self._grads(q, k, v, 1 / 8.0, False, False, monkeypatch,
                            block_q=256, block_k=256)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_matches_einsum_reference(self, monkeypatch):
        """End-to-end: fused-backward grads vs plain XLA softmax attention."""
        from generativemodels_tpu.ops.flash_attention import flash_attention

        rng = np.random.RandomState(13)
        q = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
        scale = 1 / np.sqrt(32)
        monkeypatch.setenv("GMTPU_FLASH_FUSED_BWD", "1")

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, scale=scale, interpret=True, block_q=128, block_k=128
            ) ** 2)

        def f_ref(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
            return jnp.sum(jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), v) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        ge = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestFlashBwdInterleave:
    """GMTPU_FLASH_BWD_ILV splits the split-backward tiles into sub-chunks
    (s/dp matmuls issued ahead of the VPU chains). Pure instruction-
    scheduling change: grads must match the monolithic backward exactly
    in every regime (causal dead/diagonal/interior tiles, ragged kv,
    malformed knob values degrade to off)."""

    def _grads(self, q, k, v, scale, causal, bilv, monkeypatch,
               block_q=128, block_k=128):
        from generativemodels_tpu.ops.flash_attention import flash_attention

        if bilv is None:
            monkeypatch.delenv("GMTPU_FLASH_BWD_ILV", raising=False)
        else:
            monkeypatch.setenv("GMTPU_FLASH_BWD_ILV", bilv)

        def f(q, k, v):
            out = flash_attention(
                q, k, v, scale=scale, causal=causal, interpret=True,
                block_q=block_q, block_k=block_k,
            )
            return jnp.sum(out ** 2)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("bilv", ["2,2", "4", "1,2"])
    def test_matches_monolithic(self, causal, bilv, monkeypatch):
        rng = np.random.RandomState(21)
        sk = 256 if causal else 384  # ragged non-causal: 384 % 128 == 0; use 320 below
        q = jnp.asarray(rng.standard_normal((2, 256, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, sk, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, sk, 64)).astype(np.float32))
        g0 = self._grads(q, k, v, 1 / 8.0, causal, "1,1", monkeypatch)
        g1 = self._grads(q, k, v, 1 / 8.0, causal, bilv, monkeypatch)
        # chunked accumulation reassociates the fp sums (per-chunk dots
        # over the same k columns); exact-bit equality is not expected.
        # atol absorbs the causal-diagonal dp-delta cancellation: rows
        # attending a single key have ds == 0 up to one ulp of dp, so a
        # reassociated dot turns an exact 0 into ~1e-6.
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_ragged_kv_and_malformed(self, monkeypatch):
        rng = np.random.RandomState(22)
        q = jnp.asarray(rng.standard_normal((1, 256, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 320, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 320, 64)).astype(np.float32))
        g0 = self._grads(q, k, v, 1 / 8.0, False, "1,1", monkeypatch)
        # unset and malformed values fall back to the per-shape dispatch
        # default (_pick_bwd_ilv); valid values are honoured. All variants
        # are pure instruction-schedule changes so grads agree to fp
        # reassociation tolerance.
        for val in [None, "2,2", "banana", "0,2", "3,3"]:
            g1 = self._grads(q, k, v, 1 / 8.0, False, val, monkeypatch)
            for a, b in zip(g0, g1):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-5,
                                           err_msg=f"GMTPU_FLASH_BWD_ILV={val!r}")

    def test_default_dispatch(self):
        from generativemodels_tpu.ops.flash_attention import _pick_bwd_ilv

        assert _pick_bwd_ilv(64) == (2, 2)   # narrow head: measured +11-20%
        assert _pick_bwd_ilv(256) == (1, 1)  # wide head: measured neutral

    def test_vs_einsum_reference(self, monkeypatch):
        from generativemodels_tpu.ops.flash_attention import flash_attention

        rng = np.random.RandomState(23)
        q = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
        scale = 1 / np.sqrt(32)
        monkeypatch.setenv("GMTPU_FLASH_BWD_ILV", "2,2")

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, scale=scale, interpret=True, block_q=128, block_k=128
            ) ** 2)

        def f_ref(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
            return jnp.sum(jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), v) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        ge = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
