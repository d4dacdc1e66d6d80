"""Pallas TPU flash-attention with custom VJP (online softmax, O(S) memory).

This is the TPU-native replacement for the reference's optional xformers
`memory_efficient_attention` path (generative/networks/nets/
diffusion_model_unet.py:128-135, generative/networks/blocks/
selfattention.py:113-124). Self/cross and causal attention are supported;
accumulation is float32 regardless of input dtype.

Layout: (batch*heads, seq, head_dim). Forward saves the per-row logsumexp;
backward recomputes attention probabilities blockwise in two Pallas kernels
(dq over q-blocks; dk/dv over k-blocks), so the S x S score matrix is never
materialised in HBM in either direction.
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


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, scale, causal, kv_len, block_q, block_k,
):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    d = q.shape[-1]
    num_k_blocks = pl.cdiv(k_ref.shape[1], block_k)

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    if causal:
        last = jnp.minimum(num_k_blocks, ((qi + 1) * block_q + block_k - 1) // block_k)
        acc, m, l = jax.lax.fori_loop(0, last, body, (acc, m, l))
    else:
        acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc, m, l))

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe))[:, 0]


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, causal, kv_len, block_q, block_k,
):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    d = q.shape[-1]
    num_k_blocks = pl.cdiv(k_ref.shape[1], block_k)

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jnp.zeros((block_q, d), jnp.float32)
    if causal:
        last = jnp.minimum(num_k_blocks, ((qi + 1) * block_q + block_k - 1) // block_k)
        dq = jax.lax.fori_loop(0, last, body, dq)
    else:
        dq = jax.lax.fori_loop(0, num_k_blocks, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, causal, kv_len, q_len, block_q, block_k,
):
    kj = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    d = k.shape[-1]
    num_q_blocks = pl.cdiv(q_ref.shape[1], block_q)

    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = col < kv_len
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)

        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_new = dk + scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)
    if causal:
        # only q rows at/after this k block's diagonal contribute
        first = (kj * block_k) // block_q
        dk, dv = jax.lax.fori_loop(first, num_q_blocks, body, (dk, dv))
    else:
        dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


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

    grid = (bh, sq_p // block_q)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, kv_len=sk, block_q=block_q, block_k=block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk_p, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq_p), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq], (q, k, v, out[:, :sq], lse)


def _flash_fwd(q, k, v, scale, causal, block_q, block_k, interpret):
    out, res = _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret)
    return out, res


def _flash_bwd(scale, causal, block_q, block_k, interpret, res, dout):
    q, k, v, out, lse = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (bh, sq)
    if sq_p != sq:
        delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))
    delta = delta[:, None, :]  # (bh, 1, sq_p) for TPU tiling
    qp = _pad_seq(q, sq_p)
    dop = _pad_seq(dout, sq_p)
    kp, vp = _pad_seq(k, sk_p), _pad_seq(v, sk_p)
    lse_p = lse  # already padded length from forward

    common = dict(scale=scale, causal=causal, kv_len=sk, block_q=block_q, block_k=block_k)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(bh, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, q_len=sq, **common),
        grid=(bh, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, sq_p, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, sq_p, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, sq_p), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, sq_p), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta)

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
