"""Pallas TPU flash-attention with custom VJP (online softmax, O(S) memory).

This is the TPU-native replacement for the reference's optional xformers
`memory_efficient_attention` path (generative/networks/nets/
diffusion_model_unet.py:128-135, generative/networks/blocks/
selfattention.py:113-124). Self/cross and causal attention are supported.

Layout: (batch*heads, seq, head_dim). K/V stream through the grid's
innermost dimension in `block_k` tiles — VMEM holds only one q tile, one
k/v tile and the online-softmax accumulators, so sequence length is
bounded by HBM, not VMEM (needed for 3D volumes where flattened spatial
sequences reach 32k+). Backward recomputes probabilities blockwise in two
kernels (dq over k-tiles; dk/dv over q-tiles).

Performance notes (v5e, tools/xplane_summary.py + benchmarks/
bench_attention.py):
  - MXU matmuls run in the *input* dtype (bf16 for the flagship configs)
    with float32 accumulation via preferred_element_type; the softmax
    state (m, l, acc) stays float32. Upcasting the operands to f32 (the
    round-1 design) cut MXU throughput ~4x and was the reason the kernel
    lost to XLA fused attention below seq 8192.
  - Masking is elided statically: non-causal tiles with an aligned kv
    length skip it entirely; causal interior tiles skip the triangle.
  - Block sizes from an on-chip sweep (benchmarks/sweep_flash_blocks.py):
    block_q=256 / block_k=1024 wins at the flagship shapes (bench re-run:
    seq 1024 d=256 fwd 1.10 ms vs 1.35 ms XLA fused; seq 4096 d=64
    0.37 vs 0.57; fwd+bwd 2.33 vs 3.21 and 0.70 vs 1.34).
  - The softmax runs in the log2 domain (exp2) with log2(e) folded into
    the q prescale. Measured on v5e: +4.5% kernel fwd at seq 1024/d256,
    a wash (+0.4%) at 32k/d64 — kept because sampling is forward-only
    and no shape loses beyond noise.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e)
LN2 = 0.6931471805599453  # 1/LOG2E


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm_dtype(dtype, upcast: bool = False) -> jnp.dtype:
    """Matmul operand dtype: keep bf16 on the MXU, everything else f32.

    `upcast=True` forces f32 operands, matching the reference
    `upcast_attention` contract (operands cast to f32 *before* the score
    matmul — diffusion_model_unet.py:137-154) at ~4x MXU throughput cost.
    """
    if upcast:
        return jnp.float32
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def _build_mask(qi, kj, block_q, block_k, kv_len, causal, *, interior,
                row0=0, col0=0, rows=None, cols=None):
    """Boolean tile mask, or None if the tile is statically fully live.

    `interior` is a *static* hint that this call sites only runs for tiles
    strictly below the causal diagonal (so only kv-bound masking applies).
    `row0/col0/rows/cols` address a sub-tile (the interleaved chunks).
    """
    rows = block_q if rows is None else rows
    cols = block_k if cols is None else cols
    need_kv_bound = kv_len % block_k != 0
    need_tri = causal and not interior
    if not (need_kv_bound or need_tri):
        return None
    col = kj * block_k + col0 + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    mask = None
    if need_kv_bound:
        mask = col < kv_len
    if need_tri:
        row = qi * block_q + row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        tri = col <= row
        mask = tri if mask is None else (mask & tri)
    return mask


def _pv_update(p, v, rows, l_ref, acc_ref, *, fold_l):
    """Accumulate one PV product (and the row-sum l) for a row slice.

    With `fold_l` the v tile arrives with the ones-column ALREADY padded
    on (host-side, `_flash_fwd_impl`) — padding per tile in-kernel would
    re-materialise the whole tile on the VPU every grid step; padding
    once in HBM costs d/(d+1) extra bytes on the v stream instead.
    """
    if fold_l:
        acc_ref[rows] = acc_ref[rows] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    l_ref[rows] = l_ref[rows] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[rows] = acc_ref[rows] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_tile_ilv(q, k, v, qi, kj, l_ref, acc_ref, *, scale, causal, kv_len,
                  block_q, block_k, interior, exp_fn, fold_l, ilv_q, ilv_k):
    """Interleaved no_max tile: split the tile into `ilv_q*ilv_k` chunks and
    issue all score matmuls before the probs/PV chains, handing Mosaic's
    scheduler independent MXU and VPU instruction streams to overlap
    (the monolithic tile's QK->clamp/exp2->PV chain executes additively:
    benchmarks/probe_overlap.py). Additive-only accumulation (no running
    max / alpha rescale) is what makes the chunk order irrelevant.
    """
    bq = q.shape[0] // ilv_q
    bk = k.shape[0] // ilv_k
    chunks = []
    for cq in range(ilv_q):
        qc = q[cq * bq:(cq + 1) * bq]
        for ck in range(ilv_k):
            s = jax.lax.dot_general(
                qc, k[ck * bk:(ck + 1) * bk], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if scale != 1.0:
                s = s * scale
            mask = _build_mask(
                qi, kj, block_q, block_k, kv_len, causal, interior=interior,
                row0=cq * bq, col0=ck * bk, rows=bq, cols=bk,
            )
            if mask is not None:
                s = jnp.where(mask, s, NEG_INF)
            chunks.append((cq, ck, s))
    for cq, ck, s in chunks:
        p = exp_fn(jnp.minimum(s, 80.0))
        _pv_update(
            p, v[ck * bk:(ck + 1) * bk], slice(cq * bq, (cq + 1) * bq),
            l_ref, acc_ref, fold_l=fold_l,
        )


def _fwd_tile(q, k, v, qi, kj, m_ref, l_ref, acc_ref, *, scale, causal, kv_len,
              block_q, block_k, interior, exp2=False, no_max=False,
              fold_l=False, ilv_q=1, ilv_k=1):
    """One online-softmax update for a (block_q, block_k) score tile.

    With `exp2=True` the scores arrive pre-multiplied by log2(e) (folded
    into the q prescale, see `flash_attention`) and the whole online
    softmax runs in the log2 domain: `exp2` replaces `exp`, saving the
    implicit x*log2e multiply inside every transcendental over the score
    tile. The softmax weights are bit-equivalent in exact arithmetic.
    """
    if no_max and (ilv_q > 1 or ilv_k > 1):
        _fwd_tile_ilv(
            q, k, v, qi, kj, l_ref, acc_ref, scale=scale, causal=causal,
            kv_len=kv_len, block_q=block_q, block_k=block_k,
            interior=interior, exp_fn=jnp.exp2 if exp2 else jnp.exp,
            fold_l=fold_l, ilv_q=ilv_q, ilv_k=ilv_k,
        )
        return
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    mask = _build_mask(qi, kj, block_q, block_k, kv_len, causal, interior=interior)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)

    exp_fn = jnp.exp2 if exp2 else jnp.exp
    if no_max:
        # clamped (max-free) softmax, log2 domain only: f32 exp2 holds up
        # to 2^127, so an upper clamp at 80 keeps l/acc in range for ANY
        # input (l <= 2^15 * 2^80, acc ~ l * |v|) while distorting weights
        # only beyond natural logits ~55 — far outside anything a
        # GroupNorm'd model produces. No lower clamp: exp2 underflows to
        # an exact 0 (masked scores included). Drops the per-tile max
        # reduction AND the cross-block alpha rescale.
        # fold_l rides the row-sum l on the PV matmul: at d % 128 != 0 the
        # MXU lane tile has idle columns, so a ones-column appended to v
        # computes l for free and the (block_q, block_k) VPU reduce
        # disappears; acc's last column accumulates l.
        p = exp_fn(jnp.minimum(s, 80.0))
        _pv_update(p, v, slice(None), l_ref, acc_ref, fold_l=fold_l)
        return
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = exp_fn(s - m_new)
    alpha = exp_fn(m_prev - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, causal, kv_len, block_q, block_k, upcast=False, exp2=False,
    no_max=False, fold_l=False, ilv_q=1, ilv_k=1,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    mm = _mm_dtype(q_ref.dtype, upcast)
    q = q_ref[0].astype(mm)
    k = k_ref[0].astype(mm)
    v = v_ref[0].astype(mm)
    tile = functools.partial(
        _fwd_tile, q, k, v, qi, kj, m_ref, l_ref, acc_ref,
        scale=scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_k=block_k, exp2=exp2, no_max=no_max,
        fold_l=fold_l, ilv_q=ilv_q, ilv_k=ilv_k,
    )

    if causal:
        # interior tiles (strictly below the diagonal band) skip the
        # triangle mask; diagonal-crossing tiles apply it; dead tiles skip.
        first_col = kj * block_k
        last_col = first_col + block_k - 1
        first_row = qi * block_q
        last_row = first_row + block_q - 1

        @pl.when(last_col <= first_row)
        def _():
            tile(interior=True)

        @pl.when((last_col > first_row) & (first_col <= last_row))
        def _():
            tile(interior=False)
    else:
        tile(interior=False)

    @pl.when(kj == num_k - 1)
    def _():
        # log2-domain lse when exp2: consumed consistently by the backward
        log_fn = jnp.log2 if exp2 else jnp.log
        if fold_l:
            d = o_ref.shape[-1]
            l_safe = jnp.maximum(acc_ref[:, d:], 1e-30)
            o_ref[0] = (acc_ref[:, :d] / l_safe).astype(o_ref.dtype)
            lse_ref[0, 0] = log_fn(l_safe)[:, 0]
            return
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        if no_max:
            lse_ref[0, 0] = log_fn(l_safe)[:, 0]
        else:
            lse_ref[0, 0] = (m_ref[...] + log_fn(l_safe))[:, 0]


def _dq_tile_ilv(q, k, v, do, lse, delta, qi, kj, acc_ref, *, scale,
                 causal, kv_len, block_q, block_k, interior, exp2,
                 ilv_q, ilv_k):
    """Interleaved (no_max) dq tile: issue every chunk's TWO independent
    MXU matmuls (s = q@k^T and dp = do@v^T) before any of the VPU
    exp2/ds chains, so Mosaic can overlap the streams — the monolithic
    tile's s->p->dp->ds->dq chain executes additively (probe_overlap.py,
    same structure as the forward). Requires no_max: p is computed from
    the clamped score directly, no cross-chunk running max."""
    bq = q.shape[0] // ilv_q
    bk = k.shape[0] // ilv_k
    exp_fn = jnp.exp2 if exp2 else jnp.exp
    chunks = []
    for cq in range(ilv_q):
        rows = slice(cq * bq, (cq + 1) * bq)
        qc, doc = q[rows], do[rows]
        for ck in range(ilv_k):
            cols = slice(ck * bk, (ck + 1) * bk)
            s = jax.lax.dot_general(
                qc, k[cols], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                doc, v[cols], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            chunks.append((cq, ck, rows, s, dp))
    for cq, ck, rows, s, dp in chunks:
        if scale != 1.0:
            s = s * scale
        p = exp_fn(jnp.minimum(s, 80.0) - lse[rows])
        mask = _build_mask(
            qi, kj, block_q, block_k, kv_len, causal, interior=interior,
            row0=cq * bq, col0=ck * bk, rows=bq, cols=bk,
        )
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        ds = (p * (dp - delta[rows])).astype(k.dtype)
        dq_part = jax.lax.dot_general(
            ds, k[ck * bk:(ck + 1) * bk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[rows] += scale * dq_part if scale != 1.0 else dq_part


def _dq_tile(q, k, v, do, lse, delta, qi, kj, acc_ref, *, scale, causal,
             kv_len, block_q, block_k, interior, exp2=False, no_max=False,
             ilv_q=1, ilv_k=1):
    if no_max and (ilv_q > 1 or ilv_k > 1):
        _dq_tile_ilv(
            q, k, v, do, lse, delta, qi, kj, acc_ref, scale=scale,
            causal=causal, kv_len=kv_len, block_q=block_q, block_k=block_k,
            interior=interior, exp2=exp2, ilv_q=ilv_q, ilv_k=ilv_k,
        )
        return
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    if no_max:
        s = jnp.minimum(s, 80.0)  # mirror the forward's upper clamp
    # exp2 mode: s and lse are both in the log2 domain, p is exact softmax;
    # the missing d(softmax)/ds factor ln2 arrives via the do/delta prescale
    # in _flash_bwd, so ds (and hence dq/dk) needs no extra multiply here.
    p = (jnp.exp2 if exp2 else jnp.exp)(s - lse)
    mask = _build_mask(qi, kj, block_q, block_k, kv_len, causal, interior=interior)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(k.dtype)
    dq_part = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[...] += scale * dq_part if scale != 1.0 else dq_part


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, scale, causal, kv_len, block_q, block_k, upcast=False, exp2=False,
    no_max=False, ilv_q=1, ilv_k=1,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mm = _mm_dtype(q_ref.dtype, upcast)
    q = q_ref[0].astype(mm)
    k = k_ref[0].astype(mm)
    v = v_ref[0].astype(mm)
    do = do_ref[0].astype(mm)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    tile = functools.partial(
        _dq_tile, q, k, v, do, lse, delta, qi, kj, acc_ref,
        scale=scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_k=block_k, exp2=exp2, no_max=no_max,
        ilv_q=ilv_q, ilv_k=ilv_k,
    )

    if causal:
        first_col = kj * block_k
        last_col = first_col + block_k - 1
        first_row = qi * block_q
        last_row = first_row + block_q - 1

        @pl.when(last_col <= first_row)
        def _():
            tile(interior=True)

        @pl.when((last_col > first_row) & (first_col <= last_row))
        def _():
            tile(interior=False)
    else:
        tile(interior=False)

    @pl.when(kj == num_k - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_tile_ilv(q, k, v, do, lse, delta, qi, kj, dk_acc_ref, dv_acc_ref,
                  *, scale, causal, kv_len, block_q, block_k, interior,
                  exp2, ilv_q, ilv_k):
    """Interleaved (no_max) dk/dv tile — see `_dq_tile_ilv`. Chunk rows
    split the q tile, chunk cols split the k/v tile; dv/dk accumulate per
    column chunk."""
    bq = q.shape[0] // ilv_q
    bk = k.shape[0] // ilv_k
    exp_fn = jnp.exp2 if exp2 else jnp.exp
    chunks = []
    for cq in range(ilv_q):
        rows = slice(cq * bq, (cq + 1) * bq)
        qc, doc = q[rows], do[rows]
        for ck in range(ilv_k):
            cols = slice(ck * bk, (ck + 1) * bk)
            s = jax.lax.dot_general(
                qc, k[cols], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                doc, v[cols], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            chunks.append((cq, ck, rows, s, dp))
    for cq, ck, rows, s, dp in chunks:
        cols = slice(ck * bk, (ck + 1) * bk)
        if scale != 1.0:
            s = s * scale
        p = exp_fn(jnp.minimum(s, 80.0) - lse[rows])
        mask = _build_mask(
            qi, kj, block_q, block_k, kv_len, causal, interior=interior,
            row0=cq * bq, col0=ck * bk, rows=bq, cols=bk,
        )
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        qc, doc = q[rows], do[rows]
        dv_acc_ref[cols] += jax.lax.dot_general(
            p.astype(doc.dtype), doc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta[rows])).astype(qc.dtype)
        dk_part = jax.lax.dot_general(
            ds, qc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc_ref[cols] += scale * dk_part if scale != 1.0 else dk_part


def _dkv_tile(q, k, v, do, lse, delta, qi, kj, dk_acc_ref, dv_acc_ref, *,
              scale, causal, kv_len, block_q, block_k, interior, exp2=False,
              no_max=False, ilv_q=1, ilv_k=1):
    if no_max and (ilv_q > 1 or ilv_k > 1):
        _dkv_tile_ilv(
            q, k, v, do, lse, delta, qi, kj, dk_acc_ref, dv_acc_ref,
            scale=scale, causal=causal, kv_len=kv_len, block_q=block_q,
            block_k=block_k, interior=interior, exp2=exp2,
            ilv_q=ilv_q, ilv_k=ilv_k,
        )
        return
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    if no_max:
        s = jnp.minimum(s, 80.0)
    p = (jnp.exp2 if exp2 else jnp.exp)(s - lse)
    mask = _build_mask(qi, kj, block_q, block_k, kv_len, causal, interior=interior)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    pc = p.astype(do.dtype)
    dv_acc_ref[...] += jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_part = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_acc_ref[...] += scale * dk_part if scale != 1.0 else dk_part


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale, causal, kv_len, block_q, block_k, upcast=False, exp2=False,
    no_max=False, ilv_q=1, ilv_k=1,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    mm = _mm_dtype(q_ref.dtype, upcast)
    q = q_ref[0].astype(mm)
    k = k_ref[0].astype(mm)
    v = v_ref[0].astype(mm)
    do = do_ref[0].astype(mm)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    tile = functools.partial(
        _dkv_tile, q, k, v, do, lse, delta, qi, kj, dk_acc_ref, dv_acc_ref,
        scale=scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_k=block_k, exp2=exp2, no_max=no_max,
        ilv_q=ilv_q, ilv_k=ilv_k,
    )

    if causal:
        # under causal masking, q tiles before this k tile's diagonal
        # contribute nothing; q tiles past the band need no triangle mask.
        first_col = kj * block_k
        last_col = first_col + block_k - 1
        first_row = qi * block_q
        last_row = first_row + block_q - 1

        @pl.when(first_row >= last_col + 1)
        def _():
            tile(interior=True)

        @pl.when((last_row >= first_col) & (first_row < last_col + 1))
        def _():
            tile(interior=False)
    else:
        tile(interior=False)

    @pl.when(qi == num_q - 1)
    def _():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        # exp2 mode feeds do*ln2 into both backward kernels so ds carries
        # the d(softmax)/d(log2-score) factor; dv = p^T @ do must not, so
        # undo it once on the accumulated (block_k, d) tile.
        dv = dv_acc_ref[...] * LOG2E if exp2 else dv_acc_ref[...]
        dv_ref[0] = dv.astype(dv_ref.dtype)


def _dfused_tile(q, k, v, do, lse, delta, qi, kj, dqp_ref, dk_acc_ref,
                 dv_acc_ref, *, scale, causal, kv_len, block_q, block_k,
                 interior, exp2=False, no_max=False):
    """One (kj, qi) tile of the FUSED backward: dv/dk accumulate in VMEM,
    this tile's dq contribution goes straight to its own HBM slab.

    Versus the split kernels this shares the s and dp recomputations
    (2 of 7 block_q x block_k matmul passes) at the cost of writing
    num_kj partial-dq slabs to HBM and one XLA sum afterwards.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    if no_max:
        s = jnp.minimum(s, 80.0)
    p = (jnp.exp2 if exp2 else jnp.exp)(s - lse)
    mask = _build_mask(qi, kj, block_q, block_k, kv_len, causal, interior=interior)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    pc = p.astype(do.dtype)
    dv_acc_ref[...] += jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_acc_ref[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_part = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dqp_ref[0, 0] = (scale * dq_part if scale != 1.0 else dq_part).astype(
        dqp_ref.dtype
    )


def _dfused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dqp_ref, dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, scale, causal, kv_len, block_q, block_k, upcast=False, exp2=False,
    no_max=False,
):
    """Fused dq+dk+dv backward. Grid (bh, kj, qi), qi innermost sequential:
    dk/dv accumulate across qi in VMEM scratch exactly like `_dkv_kernel`;
    dq is emitted as per-(kj) PARTIAL slabs (summed over kj outside the
    kernel), which keeps every grid step race-free without revisiting
    output blocks."""
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    mm = _mm_dtype(q_ref.dtype, upcast)
    q = q_ref[0].astype(mm)
    k = k_ref[0].astype(mm)
    v = v_ref[0].astype(mm)
    do = do_ref[0].astype(mm)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    tile = functools.partial(
        _dfused_tile, q, k, v, do, lse, delta, qi, kj, dqp_ref, dk_acc_ref,
        dv_acc_ref, scale=scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_k=block_k, exp2=exp2, no_max=no_max,
    )

    if causal:
        first_col = kj * block_k
        last_col = first_col + block_k - 1
        first_row = qi * block_q
        last_row = first_row + block_q - 1

        # dead tiles (whole q tile above the diagonal band) contribute
        # nothing to dk/dv but their dq slab must still be zeroed — every
        # (kj, qi) slab is materialised and summed.
        @pl.when(last_row < first_col)
        def _():
            dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])

        @pl.when(first_row >= last_col + 1)
        def _():
            tile(interior=True)

        @pl.when((last_row >= first_col) & (first_row < last_col + 1))
        def _():
            tile(interior=False)
    else:
        tile(interior=False)

    @pl.when(qi == num_q - 1)
    def _():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv = dv_acc_ref[...] * LOG2E if exp2 else dv_acc_ref[...]
        dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_seq(x, target):
    if x.shape[1] != target:
        return jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def _flash(q, k, v, scale, causal, block_q, block_k, interpret, upcast, exp2, no_max, ilv_q, ilv_k):
    out, _ = _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret, upcast, exp2, no_max, ilv_q, ilv_k)
    return out


def _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret, upcast=False, exp2=False, no_max=False, ilv_q=1, ilv_k=1):
    bh, sq, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qp, kp, vp = _pad_seq(q, sq_p), _pad_seq(k, sk_p), _pad_seq(v, sk_p)

    grid = (bh, sq_p // block_q, sk_p // block_k)
    # at d % 128 != 0 the PV matmul's lane tile has idle columns, so l
    # rides the MXU for free (ones-column on v); at full-lane widths the
    # extra column would cost a whole new 128-lane tile — keep the VPU sum.
    fold_l = no_max and d % 128 != 0
    dv = d
    if fold_l:
        # ones-column padded ONCE here (not per tile in-kernel): masked/
        # dead kv rows have p == exactly 0 under no_max, so the column
        # accumulates the true row-sum l into acc's last column.
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 1)), constant_values=1)
        dv = d + 1
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, kv_len=sk, block_q=block_q,
        block_k=block_k, upcast=upcast, exp2=exp2, no_max=no_max,
        fold_l=fold_l, ilv_q=ilv_q, ilv_k=ilv_k,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, i, j: (b, j, 0)),
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
            pltpu.VMEM((block_q, d + 1 if fold_l else d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq], (q, k, v, out[:, :sq], lse)


def _flash_fwd(q, k, v, scale, causal, block_q, block_k, interpret, upcast, exp2, no_max, ilv_q, ilv_k):
    return _flash_fwd_impl(q, k, v, scale, causal, block_q, block_k, interpret, upcast, exp2, no_max, ilv_q, ilv_k)


def _pick_bwd_ilv(head_dim: int) -> tuple[int, int]:
    """Default backward-tile interleave by head width, from the on-chip
    sweep (benchmarks/probe_bwd_ilv.py -> results_bwd_ilv.json): (2, 2) is
    +19.8% fwd+bwd at (bh4, seq 4k, d64) and +11.5% at the 3D train step's
    (bh2, 32k, d64); neutral (±1.7%) at d=256. Narrow heads leave the MXU
    half-filled per tile, so issuing both sub-chunk matmuls (s, dp) ahead
    of the exp2/ds VPU chains overlaps the units; wide-head tiles already
    fill both."""
    return (2, 2) if head_dim < 128 else (1, 1)


def _flash_bwd(scale, causal, block_q, block_k, interpret, upcast, exp2, no_max, ilv_q, ilv_k, res, dout):
    # the nondiff ilv_q/ilv_k knobs shape only the forward's instruction
    # schedule; the backward has its own interleave knob (see below).
    q, k, v, out, lse = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    if exp2:
        # log2-domain backward: ds = ln2 * p * (dp - delta). Riding ln2 on
        # do (and so on dp and delta) is free; dv alone must not carry it
        # and is corrected in the _dkv epilogue.
        dout = dout * jnp.asarray(LN2, dout.dtype)
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if sq_p != sq:
        delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))
    delta = delta[:, None, :]  # (bh, 1, sq_p) for TPU tiling
    qp = _pad_seq(q, sq_p)
    dop = _pad_seq(dout, sq_p)
    kp, vp = _pad_seq(k, sk_p), _pad_seq(v, sk_p)

    common = dict(scale=scale, causal=causal, kv_len=sk, block_q=block_q,
                  block_k=block_k, upcast=upcast, exp2=exp2, no_max=no_max)

    # backward-tile interleave (the forward's ilv trick applied to the
    # split backward kernels): issue each sub-chunk's two independent MXU
    # matmuls (s, dp) ahead of the VPU exp2/ds chains. Per-shape default
    # from the on-chip sweep (_pick_bwd_ilv); GMTPU_FLASH_BWD_ILV
    # overrides (unset/malformed falls back to the dispatch default).
    # Requires no_max (additive accumulation, no alpha).
    raw_bilv = os.environ.get("GMTPU_FLASH_BWD_ILV", "")
    try:
        parts = [int(p) for p in raw_bilv.split(",")]
        bilv = (parts[0], parts[-1]) if len(parts) > 1 else (1, parts[0])
    except ValueError:
        bilv = _pick_bwd_ilv(d)
    bilv_q, bilv_k = max(1, bilv[0]), max(1, bilv[1])
    if not no_max or block_q % bilv_q or block_k % bilv_k:
        bilv_q = bilv_k = 1
    split_common = dict(common, ilv_q=bilv_q, ilv_k=bilv_k)

    if os.environ.get("GMTPU_FLASH_FUSED_BWD", "0") == "1":
        # The fused kernel keeps more f32 intermediates live per tile than
        # the split kernels (s, p, dp, ds all at block_q x block_k), so the
        # forward's dispatch-table blocks can exceed the 16 MiB scoped-VMEM
        # stack (measured: bq1024 x bk2048 at 32k OOMs by 1.5 MiB). Cap the
        # score tile at 1M elements (4 MiB f32), halving block_q first:
        # num_kj = sk/block_k sets how many partial-dq f32 slabs are written
        # to HBM and summed, so block_k is the side to keep large.
        fb_q, fb_k = block_q, block_k
        override = os.environ.get("GMTPU_FLASH_FUSED_BWD_BLOCKS", "")
        if override:
            fb_q, fb_k = (int(x) for x in override.split(","))
        else:
            while fb_q * fb_k > 1 << 20 and max(fb_q, fb_k) > 128:
                if fb_q > 128:
                    fb_q //= 2
                else:
                    fb_k //= 2
        fsq_p = _round_up(sq, fb_q)
        fsk_p = _round_up(sk, fb_k)
        fqp = _pad_seq(q, fsq_p)
        fdop = _pad_seq(dout, fsq_p)
        fkp, fvp = _pad_seq(k, fsk_p), _pad_seq(v, fsk_p)
        flse = lse if fsq_p == lse.shape[-1] else lse[:, :, :fsq_p] if fsq_p < lse.shape[-1] else jnp.pad(lse, ((0, 0), (0, 0), (0, fsq_p - lse.shape[-1])))
        fdelta = delta if fsq_p == delta.shape[-1] else delta[:, :, :fsq_p] if fsq_p < delta.shape[-1] else jnp.pad(delta, ((0, 0), (0, 0), (0, fsq_p - delta.shape[-1])))
        fcommon = dict(common, block_q=fb_q, block_k=fb_k)
        num_kj = fsk_p // fb_k
        dqp, dk, dv = pl.pallas_call(
            functools.partial(_dfused_kernel, **fcommon),
            grid=(bh, num_kj, fsq_p // fb_q),
            in_specs=[
                pl.BlockSpec((1, fb_q, d), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec((1, fb_k, d), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, fb_k, d), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, fb_q, d), lambda b, j, i: (b, i, 0)),
                pl.BlockSpec((1, 1, fb_q), lambda b, j, i: (b, 0, i)),
                pl.BlockSpec((1, 1, fb_q), lambda b, j, i: (b, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, fb_q, d), lambda b, j, i: (b, j, i, 0)),
                pl.BlockSpec((1, fb_k, d), lambda b, j, i: (b, j, 0)),
                pl.BlockSpec((1, fb_k, d), lambda b, j, i: (b, j, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, num_kj, fsq_p, d), jnp.float32),
                jax.ShapeDtypeStruct((bh, fsk_p, d), k.dtype),
                jax.ShapeDtypeStruct((bh, fsk_p, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((fb_k, d), jnp.float32),
                pltpu.VMEM((fb_k, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(fqp, fkp, fvp, fdop, flse, fdelta)
        dq = jnp.sum(dqp, axis=1).astype(q.dtype)
        return dq[:, :sq], dk[:, :sk], dv[:, :sk]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **split_common),
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
        functools.partial(_dkv_kernel, **split_common),
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
    block_k: int = 1024,
    interpret: bool = False,
    upcast: bool = False,
    no_max: bool | None = None,
    ilv: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Differentiable flash attention over (BH, S, D) tensors.

    Args:
        q: (BH, Sq, D); k, v: (BH, Sk, D). Matmuls run in the input dtype
            (bf16 on the MXU for bf16 inputs) with f32 accumulation; the
            softmax state is always f32.
        scale: softmax temperature (typically 1/sqrt(D)).
        causal: lower-triangular masking.
        interpret: run kernels in interpreter mode (CPU testing).
        upcast: force f32 matmul operands (reference `upcast_attention`
            operand semantics; ~4x slower on the MXU for bf16 inputs).
        no_max: max-free online softmax (default on, env
            `GMTPU_FLASH_NOMAX=0` to disable). Scores are clamped to
            [-120, 80] in the log2 domain instead of tracking a running
            row max — f32 exp2 holds the clamped range exactly (l <=
            2^15 * 2^80), and the per-tile max reduction plus the
            cross-block alpha rescale of acc/l disappear (+17% fwd at
            seq 32k/d64, +11% at 1024/d256 — results_nomax_probe.json).
            Contract: exact softmax whenever natural logits stay within
            ~±55 (any GroupNorm'd/trained model); beyond that weights
            saturate equally instead of argmax-ing, and the clamp's
            gradient is treated as identity. Disabled under upcast.
        ilv: (ilv_q, ilv_k) forward-tile interleave factors — split each
            (block_q, block_k) tile into sub-chunks and issue all score
            matmuls before the probs/PV chains so Mosaic can overlap the
            VPU clamp/exp2 stream with MXU matmuls (probe_overlap.py).
            Requires no_max (additive accumulation). Default from env
            `GMTPU_FLASH_ILV` as "q,k" (e.g. "1,2"), else (1, 1).

    Returns:
        (BH, Sq, D) attention output in q.dtype.
    """
    sq, sk = q.shape[1], k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    # fold the softmax scale *and* log2(e) into q: one fewer VPU pass over
    # every score tile (6% at the 3D 32k/d64 shape, results_attn_vpu.json),
    # and the online softmax then runs in the log2 domain (exp2 instead of
    # exp — drops the implicit x*log2e multiply inside each transcendental).
    # The gradient chain through this multiply restores dq's scale factor.
    exp2 = not upcast
    if exp2:
        q = q * jnp.asarray(scale * LOG2E, q.dtype)
        scale = 1.0
    if no_max is None:
        no_max = os.environ.get("GMTPU_FLASH_NOMAX", "1") == "1"
    no_max = no_max and exp2  # clamp bounds are derived for the log2 domain
    if ilv is None:
        raw = os.environ.get("GMTPU_FLASH_ILV", "1,1")
        try:
            parts = [int(p) for p in raw.split(",")]
            ilv = (parts[0], parts[-1]) if len(parts) > 1 else (1, parts[0])
        except ValueError:  # malformed knob degrades to off, like NOMAX
            ilv = (1, 1)
    ilv_q, ilv_k = max(1, ilv[0]), max(1, ilv[1])
    if not no_max or block_q % ilv_q or block_k % ilv_k:
        ilv_q = ilv_k = 1  # interleave is only derived for additive (no_max) tiles
    return _flash(q, k, v, scale, causal, block_q, block_k, interpret, upcast, exp2, no_max, ilv_q, ilv_k)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
    upcast: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-only flash attention returning (out, lse).

    For ring/sequence-parallel attention (ops/sharded_attention.py): each
    K/V chunk's normalized output combines across chunks via
    out = sum_i exp(lse_i - lse_tot) * out_i. `lse` is returned in the
    NATURAL-log domain regardless of the kernel's internal log2 mode
    (the kernel prescales q by scale*log2e and tracks log2(l); the ln2
    conversion restores logsumexp(scale * q k^T) exactly up to fp).

    Not differentiable (bypasses the custom-VJP wrapper); the sharded
    dispatcher keeps training on the all-gather-K/V path.

    Returns:
        out: (BH, Sq, D) chunk-softmax-normalized output in q.dtype.
        lse: (BH, Sq) f32 natural-log row logsumexp.
    """
    sq, sk = q.shape[1], k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    exp2 = not upcast
    if exp2:
        q = q * jnp.asarray(scale * LOG2E, q.dtype)
        scale = 1.0
    no_max = exp2 and os.environ.get("GMTPU_FLASH_NOMAX", "1") == "1"
    out, (_, _, _, _, lse) = _flash_fwd_impl(
        q, k, v, scale, False, block_q, block_k, interpret, upcast, exp2,
        no_max, 1, 1,
    )
    lse = lse[:, 0, : out.shape[1]]
    if exp2:
        lse = lse * jnp.float32(LN2)
    return out, lse
