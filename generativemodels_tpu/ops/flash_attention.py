"""Pallas TPU flash-attention kernel (online softmax, O(S) memory).

This is the TPU-native replacement for the reference's optional xformers
`memory_efficient_attention` path (generative/networks/nets/
diffusion_model_unet.py:128-135, generative/networks/blocks/
selfattention.py:113-124). Self/cross and causal attention are supported;
accumulation is float32 regardless of input dtype.

Layout: (batch*heads, seq, head_dim). The grid iterates (bh, q_block); each
program streams K/V blocks for its (bh) slice from VMEM with an online
softmax, so the S×S score matrix is never materialised in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    scale: float,
    causal: bool,
    kv_len: int,
    block_q: int,
    block_k: int,
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
        )  # (block_q, block_k)

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
        # skip fully-masked key blocks past the diagonal
        last = jnp.minimum(num_k_blocks, ((qi + 1) * block_q + block_k - 1) // block_k)
        acc, m, l = jax.lax.fori_loop(0, last, body, (acc, m, l))
    else:
        acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc, m, l))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "block_q", "block_k", "interpret")
)
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
    """Flash attention over (BH, S, D) tensors.

    Args:
        q: (BH, Sq, D); k, v: (BH, Sk, D). Any float dtype; accumulation f32.
        scale: softmax temperature (typically 1/sqrt(D)).
        causal: lower-triangular masking (requires Sq == Sk alignment).
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        (BH, Sq, D) attention output in q.dtype.
    """
    bh, sq, d = q.shape
    sk = k.shape[1]

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))

    grid = (bh, sq_p // block_q)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        kv_len=sk,
        block_q=block_q,
        block_k=block_k,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk_p, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, sk_p, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        interpret=interpret,
    )(q, k, v)

    if sq_p != sq:
        out = out[:, :sq]
    return out
