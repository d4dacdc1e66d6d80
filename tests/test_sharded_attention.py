"""Sequence-parallel attention: correctness, gradients, HLO comm pattern.

VERDICT r3 item 3: the flash kernel needs a multi-chip story — Q stays
local, K/V move (all-gather or ring), and the depth-sharded 3D sampler
must not all-gather the full-sequence Q operand around an opaque custom
call. Runs on the virtual 8-device CPU mesh (conftest).
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generativemodels_tpu.ops import dot_product_attention, sequence_sharding
from generativemodels_tpu.ops.sharded_attention import (
    _chunk_attention_with_lse,
    _combine_chunks,
)
from generativemodels_tpu.parallel import create_mesh, spatial_sharding

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _qkv(b=4, s=32, inner=16, seed=0):
    rs = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rs.randn(b, s, inner).astype(np.float32)) for _ in range(3)
    )


@needs_8
class TestSequenceParallelCorrectness:
    def test_allgather_matches_unsharded(self):
        q, k, v = _qkv()
        ref = dot_product_attention(q, k, v, 2)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh, impl="allgather"):
            out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ring_matches_unsharded(self):
        q, k, v = _qkv(seed=1)
        ref = dot_product_attention(q, k, v, 2)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh, impl="ring"):
            out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_space_only_mesh_odd_batch(self):
        # batch not divisible by the data axis -> replicated over data
        q, k, v = _qkv(b=3, seed=2)
        ref = dot_product_attention(q, k, v, 2)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh):
            out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_allgather_gradients_match(self):
        q, k, v = _qkv(seed=3)
        mesh = create_mesh({"data": 2, "space": 4})

        def loss(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, 2) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with sequence_sharding(mesh, impl="allgather"):
            g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_causal_allgather_matches_unsharded(self):
        q, k, v = _qkv(seed=5)
        ref = dot_product_attention(q, k, v, 2, causal=True)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh, impl="allgather"):
            out = jax.jit(
                lambda q, k, v: dot_product_attention(q, k, v, 2, causal=True)
            )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_causal_ring_matches_unsharded(self):
        q, k, v = _qkv(seed=6)
        ref = dot_product_attention(q, k, v, 2, causal=True)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh, impl="ring"):
            out = jax.jit(
                lambda q, k, v: dot_product_attention(q, k, v, 2, causal=True)
            )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_causal_allgather_gradients_match(self):
        """The AR-transformer long-context TRAINING case: causal sharded
        attention must be differentiable and match unsharded grads."""
        q, k, v = _qkv(seed=7)
        mesh = create_mesh({"data": 2, "space": 4})

        def loss(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, 2, causal=True) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with sequence_sharding(mesh, impl="allgather"):
            g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_one_device_axis_falls_back(self):
        q, k, v = _qkv(seed=4, b=8)
        ref = dot_product_attention(q, k, v, 2)
        mesh = create_mesh({"data": 8, "space": 1})
        with sequence_sharding(mesh):
            out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_cross_attention_and_masked_calls_not_rerouted(self):
        # Sq != Sk (cross-attention) and masked (KV-cache) calls must not
        # engage the sequence-parallel path
        rs = np.random.RandomState(5)
        q = jnp.asarray(rs.randn(4, 32, 16).astype(np.float32))
        k = jnp.asarray(rs.randn(4, 5, 16).astype(np.float32))
        v = jnp.asarray(rs.randn(4, 5, 16).astype(np.float32))
        ref = dot_product_attention(q, k, v, 2)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh):
            out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@needs_8
class TestStripedCausalLayout:
    """Zigzag half-block ownership for causal sharded attention (round-5
    VERDICT item 8): blocked ownership gives the last chip ~2x the
    balanced-ideal attended-key count (worst chip owns rows [s-s/n, s),
    attending every key); the striped layout pairs half-blocks {r, 2n-1-r}
    so every chip's causal work is the identical constant (s+h rows of
    keys) by construction. Everything is ppermute + einsum, so AD works
    end-to-end (the long-context AR TRAINING case)."""

    def test_causal_striped_matches_unsharded(self):
        q, k, v = _qkv(seed=8)
        ref = dot_product_attention(q, k, v, 2, causal=True)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh, impl="allgather", causal_layout="striped"):
            out = jax.jit(
                lambda q, k, v: dot_product_attention(q, k, v, 2, causal=True)
            )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_causal_striped_gradients_match(self):
        q, k, v = _qkv(seed=9)
        mesh = create_mesh({"data": 2, "space": 4})

        def loss(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, 2, causal=True) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with sequence_sharding(mesh, impl="allgather", causal_layout="striped"):
            g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_causal_ring_gradients_match(self):
        """The ring impl trains too: under AD its masked chunks run the
        differentiable einsum path (the flash-with-lse wrapper is
        forward-only, ops/sharded_attention.py module docstring) — grads
        must match the unsharded reference. The TRAINING DEFAULT remains
        allgather (docs/PERFORMANCE.md: at <=8 chips full K/V fits HBM
        trivially and the one fused collective beats n-1 hop dispatches)."""
        q, k, v = _qkv(seed=10)
        mesh = create_mesh({"data": 2, "space": 4})

        def loss(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, 2, causal=True) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with sequence_sharding(mesh, impl="ring"):
            g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_noncausal_ignores_layout(self):
        q, k, v = _qkv(seed=11)
        ref = dot_product_attention(q, k, v, 2)
        mesh = create_mesh({"data": 2, "space": 4})
        with sequence_sharding(mesh, causal_layout="striped"):
            out = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_bad_layout_rejected(self):
        mesh = create_mesh({"data": 2, "space": 4})
        with pytest.raises(ValueError, match="causal_layout"):
            with sequence_sharding(mesh, causal_layout="diagonal"):
                pass


class TestChunkCombineMath:
    def test_four_chunk_logsumexp_combine_is_exact(self):
        """The ring's chunk-combination formula reproduces full softmax
        attention exactly (einsum chunks; same math the flash-lse path
        feeds on TPU)."""
        rs = np.random.RandomState(6)
        b, s, h, d = 2, 64, 2, 8
        q = jnp.asarray(rs.randn(b, s, h * d).astype(np.float32)) * 3.0
        k = jnp.asarray(rs.randn(b, s, h * d).astype(np.float32)) * 3.0
        v = jnp.asarray(rs.randn(b, s, h * d).astype(np.float32))
        scale = 1.0 / np.sqrt(d)

        ref = dot_product_attention(q, k, v, h, scale=scale)

        n = 4
        ks = jnp.split(k, n, axis=1)
        vs = jnp.split(v, n, axis=1)
        acc_out, acc_lse = _chunk_attention_with_lse(
            q, ks[0], vs[0], h, scale, False, False
        )
        acc_out = acc_out.astype(jnp.float32)
        for i in range(1, n):
            out_i, lse_i = _chunk_attention_with_lse(
                q, ks[i], vs[i], h, scale, False, False
            )
            acc_out, acc_lse = _combine_chunks(acc_out, acc_lse, out_i, lse_i)
        combined = acc_out.reshape(b, s, h * d)
        np.testing.assert_allclose(
            np.asarray(combined), np.asarray(ref), atol=2e-5
        )

    def test_flash_interpret_chunk_lse_matches_einsum(self):
        """flash_attention_with_lse (interpret mode) agrees with the
        einsum chunk stats — the TPU ring path's building block."""
        from generativemodels_tpu.ops.flash_attention import (
            flash_attention_with_lse,
        )

        rs = np.random.RandomState(7)
        bh, s, d = 4, 128, 8
        q = jnp.asarray(rs.randn(bh, s, d).astype(np.float32))
        k = jnp.asarray(rs.randn(bh, s, d).astype(np.float32))
        v = jnp.asarray(rs.randn(bh, s, d).astype(np.float32))
        scale = 1.0 / np.sqrt(d)
        out_f, lse_f = flash_attention_with_lse(
            q, k, v, scale=scale, block_q=64, block_k=64, interpret=True
        )
        scores = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        lse_e = jax.scipy.special.logsumexp(scores, axis=-1)
        out_e = jnp.einsum(
            "bqk,bkd->bqd", jax.nn.softmax(scores, axis=-1), v
        )
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse_f), np.asarray(lse_e), atol=2e-5)


def _all_gather_result_mib(hlo: str):
    """Extract per-all-gather result sizes (MiB) from compiled HLO text."""
    sizes = []
    for m in re.finditer(r"= (\S+) all-gather", hlo):
        shape = m.group(1)
        dims = re.search(r"\[([0-9,]*)\]", shape)
        if not dims:
            continue
        n = 1
        for p in dims.group(1).split(","):
            if p:
                n *= int(p)
        bits = 32
        if "bf16" in shape or "f16" in shape:
            bits = 16
        sizes.append(n * bits / 8 / 2**20)
    return sizes


@needs_8
class TestShardedSamplerCommPattern:
    @pytest.mark.slow
    def test_3d_attention_sampler_no_full_qkv_gather(self):
        """Compile the depth-sharded 3D UNet forward WITH an attention
        level under sequence_sharding and assert the HLO contains no
        all-gather larger than the K/V streams — i.e. Q (and the S x S
        scores) never materialize un-sharded on a chip."""
        from generativemodels_tpu.networks.nets import DiffusionModelUNet

        mesh = create_mesh({"data": 2, "space": 4})
        model = DiffusionModelUNet(
            spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
            num_channels=(8, 8), attention_levels=(False, True),
            norm_num_groups=8, num_head_channels=8,
        )
        x = jnp.zeros((2, 1, 16, 16, 16))
        t = jnp.zeros((2,), jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)

        x_sh = jax.device_put(x, spatial_sharding(mesh, x.ndim, spatial_axis_index=2))
        with sequence_sharding(mesh):
            fn = jax.jit(lambda p, x, t: model.apply(p, x, t))
            lowered = fn.lower(variables, x_sh, t)
            compiled = lowered.compile()
            hlo = compiled.as_text()
            # execute too: the pattern must not just compile
            out = fn(variables, x_sh, t)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())

        # attention level 1: S = 8*8*8 = 512 rows of C=8 f32 = 16 KiB for
        # a full K (and V). The asserted ceiling is 4x one full K/V
        # operand (layout padding headroom); a gathered Q+K+V or S x S
        # scores blow well past it. Halo exchanges and parameter
        # broadcasts are far below it.
        full_kv_mib = (2 * 512 * 8 * 4) / 2**20
        sizes = _all_gather_result_mib(hlo)
        offenders = [s for s in sizes if s > 4 * full_kv_mib]
        assert not offenders, (
            f"all-gathers larger than the K/V streams: {offenders} MiB "
            f"(ceiling {4 * full_kv_mib:.4f} MiB)"
        )
