"""Multi-head attention dispatcher: XLA einsum path or Pallas flash path.

Reference parity: the manual softmax attention in
generative/networks/nets/diffusion_model_unet.py:137-154 (CrossAttention
._attention, incl. the `upcast_attention` fp32 island) and
generative/networks/blocks/selfattention.py:127-142, with the xformers
memory-efficient path replaced by the Pallas flash kernel.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

# sequence length below which the fused-XLA einsum path is always used.
# Round-2 kernel (bf16 MXU matmuls, static mask elision, block_k=1024)
# beats XLA fused attention from seq 1024 up on v5e
# (benchmarks/bench_attention.py: fwd 1.23x / fwd+bwd 1.38x at 1024 d=256
# bh=128; fwd 1.53x / fwd+bwd 1.91x at 4096 d=64). At 256 the einsum path
# still wins (tile-grid overhead dominates); above ~8k einsum cannot run
# at all (S^2 scores exceed HBM at 3D volumes' 32k+).
_FLASH_MIN_SEQ = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# widest head the Pallas kernel dispatches for. The kernel itself is
# d-generic (block specs carry d through), but on-chip at the zoo-bundle
# head widths (d=512/768, seq 1400: benchmarks/results_attention.json
# "bundle_*" rows) the fused-XLA einsum path wins, so auto-dispatch keeps
# them there; `use_flash=True` still forces the kernel at any width.
_FLASH_MAX_HEAD_DIM = 256


def resolve_use_flash(
    seq: int,
    head_dim: int,
    use_flash: bool | None = None,
    has_mask: bool = False,
    on_tpu: bool | None = None,
) -> bool:
    """The flash/einsum dispatch decision, exposed for tests and docs.

    Masked calls (KV-cache decoding) always take the einsum path; an
    explicit `use_flash` wins otherwise; auto-dispatch requires TPU,
    seq >= _FLASH_MIN_SEQ and head_dim <= _FLASH_MAX_HEAD_DIM.
    """
    if has_mask:
        return False
    if use_flash is not None:
        return use_flash
    if on_tpu is None:
        on_tpu = _on_tpu()
    return on_tpu and seq >= _FLASH_MIN_SEQ and head_dim <= _FLASH_MAX_HEAD_DIM


def _pick_blocks(seq: int, head_dim: int) -> tuple[int, int, tuple[int, int]]:
    """(block_q, block_k, (ilv_q, ilv_k)) by shape, from the on-chip
    sweeps (benchmarks/sweep_flash_blocks.py -> results_flash_sweep.json;
    benchmarks/sweep_flash_ilv.py -> results_flash_ilv.json).

    Narrow heads (d < 128) leave the MXU half-filled per tile, so bigger
    q tiles amortise the K/V streaming: at seq 32k d=64 bq=1024 is 22%
    faster than bq=256; at 4k, bq=512. Wide heads (d=256, the 2D configs)
    are insensitive to bq — keep the VMEM-lean default. The interleave
    factors split the forward tile into independent MXU/VPU chains
    (flash_attention.py `ilv`). The on-chip real-kernel sweep
    (results_flash_ilv.json) picked bk=2048 split (2, 2) for the long
    narrow-head class (5.89 ms vs 6.20 mono at 32k/d64, +5.2%); at
    d>=128 every interleave variant was 5-10x SLOWER (the wide-head tile
    already fills both units), so those stay monolithic.
    """
    if head_dim >= 128:
        return 256, 1024, (1, 1)
    if seq >= 8192:
        return 1024, 2048, (2, 2)
    return 512, 1024, (1, 1)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    scale: float | None = None,
    causal: bool = False,
    upcast: bool = False,
    use_flash: bool | None = None,
    mask: jnp.ndarray | None = None,
    seq_shard: bool | None = None,
) -> jnp.ndarray:
    """Multi-head attention over packed (B, S, H*D) tensors.

    Args:
        q: (B, Sq, inner_dim); k, v: (B, Sk, inner_dim).
        num_heads: number of attention heads H (inner_dim = H * D).
        scale: softmax scale; defaults to 1/sqrt(D).
        causal: lower-triangular mask (autoregressive decoding).
        upcast: reference `upcast_attention` flag: f32 operands for the
            score matmul. On the einsum path q/k are cast to f32; on the
            flash path the flag is threaded into the kernel, which then
            runs its MXU matmuls on f32 operands (~4x slower for bf16
            models — the f32 softmax state alone already covers the
            flag's stability purpose, but operand rounding is part of
            the reference contract, so the flag forces it).
        use_flash: True forces the Pallas kernel, False forces einsum,
            None auto-selects (TPU and long sequences).
        mask: optional boolean key mask, broadcastable to (B, Sq, Sk)
            (True = attend). Forces the einsum path (KV-cache decoding).
        seq_shard: None (default) consults the active `sequence_sharding`
            context (ops/sharded_attention.py) and routes eligible
            self-attention calls (Sq == Sk, no mask, S divisible by the
            axis; causal included — the AR-transformer long-context
            training case) through sequence-parallel shard_map; False
            disables (used internally to avoid recursion).

    Returns:
        (B, Sq, inner_dim) in q.dtype.
    """
    b, sq, inner = q.shape
    sk = k.shape[1]
    head_dim = inner // num_heads
    if scale is None:
        scale = 1.0 / (head_dim**0.5)

    if seq_shard is not False and mask is None and sq == sk:
        from .sharded_attention import current_sequence_sharding, sequence_parallel_attention

        cfg = current_sequence_sharding()
        if cfg is not None and sq % cfg.mesh.shape[cfg.axis] == 0:
            return sequence_parallel_attention(
                q, k, v, num_heads, cfg, scale=scale, upcast=upcast,
                use_flash=use_flash, causal=causal,
            )

    use_flash = resolve_use_flash(sq, head_dim, use_flash, has_mask=mask is not None)

    qh = q.reshape(b, sq, num_heads, head_dim)
    kh = k.reshape(b, sk, num_heads, head_dim)
    vh = v.reshape(b, sk, num_heads, head_dim)

    if use_flash:
        qf = qh.transpose(0, 2, 1, 3).reshape(b * num_heads, sq, head_dim)
        kf = kh.transpose(0, 2, 1, 3).reshape(b * num_heads, sk, head_dim)
        vf = vh.transpose(0, 2, 1, 3).reshape(b * num_heads, sk, head_dim)
        block_q, block_k, ilv = _pick_blocks(sq, head_dim)
        out = flash_attention(
            qf, kf, vf, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, interpret=not _on_tpu(),
            upcast=upcast,
            ilv=ilv if os.environ.get("GMTPU_FLASH_ILV") is None else None,
        )
        out = out.reshape(b, num_heads, sq, head_dim).transpose(0, 2, 1, 3)
        return out.reshape(b, sq, inner)

    dtype = q.dtype
    if upcast:
        qh = qh.astype(jnp.float32)
        kh = kh.astype(jnp.float32)

    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    if causal:
        causal_mask = jnp.tril(jnp.ones((sq, sk), dtype=bool))
        scores = jnp.where(causal_mask, scores, jnp.finfo(scores.dtype).min)
    if mask is not None:
        scores = jnp.where(
            jnp.broadcast_to(mask, (b, sq, sk))[:, None, :, :],
            scores,
            jnp.finfo(scores.dtype).min,
        )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh.astype(dtype))
    return out.reshape(b, sq, inner)
