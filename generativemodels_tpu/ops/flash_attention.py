"""Pallas TPU flash-attention with custom VJP (online softmax, O(S) memory).

This is the TPU-native replacement for the reference's optional xformers
`memory_efficient_attention` path (generative/networks/nets/
diffusion_model_unet.py:128-135, generative/networks/blocks/
selfattention.py:113-124). Self/cross and causal attention are supported;
accumulation is float32 regardless of input dtype.

Layout: (batch*heads, seq, head_dim). K/V stream through the grid's
innermost dimension in `block_k` tiles — VMEM holds only one q tile, one
k/v tile and the online-softmax accumulators, so sequence length is
bounded by HBM, not VMEM (needed for 3D volumes where flattened spatial
sequences reach 32k+). Backward recomputes probabilities blockwise in two
kernels (dq over k-tiles; dk/dv over q-tiles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mask(qi, kj, block_q, block_k, kv_len, causal):
    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask = mask & (col <= row)
    return mask


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, causal, kv_len, block_q, block_k,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    live = (kj * block_k <= (qi + 1) * block_q - 1) if causal else (kj >= 0)

    @pl.when(live)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(_mask(qi, kj, block_q, block_k, kv_len, causal), s, NEG_INF)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_new

    @pl.when(kj == num_k - 1)
    def _():
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[...] + jnp.log(l_safe))[:, 0]


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, scale, causal, kv_len, block_q, block_k,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    live = (kj * block_k <= (qi + 1) * block_q - 1) if causal else (kj >= 0)

    @pl.when(live)
    def _():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.where(
            _mask(qi, kj, block_q, block_k, kv_len, causal), jnp.exp(s - lse), 0.0
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        acc_ref[...] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kj == num_k - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale, causal, kv_len, block_q, block_k,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    # under causal masking, q tiles before this k tile's diagonal contribute nothing
    live = ((qi + 1) * block_q - 1 >= kj * block_k) if causal else (qi >= 0)

    @pl.when(live)
    def _():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.where(
            _mask(qi, kj, block_q, block_k, kv_len, causal), jnp.exp(s - lse), 0.0
        )
        dv_acc_ref[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_acc_ref[...] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qi == num_q - 1)
    def _():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _pad_seq(x, target):
    if x.shape[1] != target:
        return jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, causal, block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret)
    return out


def _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret):
    bh, sq, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qp, kp, vp = _pad_seq(q, sq_p), _pad_seq(k, sk_p), _pad_seq(v, sk_p)

    grid = (bh, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, kv_len=sk, block_q=block_q,
        block_k=block_k,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq], (q, k, v, out[:, :sq], lse)


def _flash_fwd(q, k, v, scale, causal, block_q, block_k, interpret):
    return _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret)


def _flash_bwd(scale, causal, block_q, block_k, interpret, res, dout):
    q, k, v, out, lse = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if sq_p != sq:
        delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))
    delta = delta[:, None, :]  # (bh, 1, sq_p) for TPU tiling
    qp = _pad_seq(q, sq_p)
    dop = _pad_seq(dout, sq_p)
    kp, vp = _pad_seq(k, sk_p), _pad_seq(v, sk_p)

    common = dict(scale=scale, causal=causal, kv_len=sk, block_q=block_q, block_k=block_k)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(bh, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid=(bh, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable flash attention over (BH, S, D) tensors.

    Args:
        q: (BH, Sq, D); k, v: (BH, Sk, D). Any float dtype; f32 accumulation.
        scale: softmax temperature (typically 1/sqrt(D)).
        causal: lower-triangular masking.
        interpret: run kernels in interpreter mode (CPU testing).

    Returns:
        (BH, Sq, D) attention output in q.dtype.
    """
    sq, sk = q.shape[1], k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    return _flash(q, k, v, scale, causal, block_q, block_k, interpret)
