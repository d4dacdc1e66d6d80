"""Sequence-parallel (sharded) attention over a mesh axis.

The 3D-volumes-as-long-context problem (SURVEY §5): a 128³ volume's
attention levels flatten to 32k+ sequences — the single largest cost of
3D sampling (47% of device time, benchmarks/results_3d_hlo_profile.json).
Under the "space"-sharded 3D path the inputs arrive sequence-sharded, but
GSPMD cannot partition the opaque Pallas flash custom call: left alone it
all-gathers Q, K AND V to every chip and runs the full computation
replicated. The reference has no distributed attention at all (its
xformers path, generative/networks/blocks/selfattention.py:113-124, is
single-GPU); this module is the beyond-reference analogue.

Design: `shard_map` over the mesh with Q kept local (S/n rows per chip)
and K/V communicated. Two implementations:

- "allgather" (default): one fused all-gather of K and V along the
  sequence axis, then the local flash kernel at (S/n x S). Per chip this
  moves (n-1)/n * 2*S*d*bh bytes — identical total traffic to a ring —
  as ONE fused ICI collective, keeps the kernel a single big call, and
  is fully differentiable (the all-gather transposes to a
  reduce-scatter for dK/dV under AD). The right choice at 2-8 chips,
  where full K/V fits HBM with ease (32k x 64 x bh=8 bf16 = 64 MB).
- "ring": n-1 `lax.ppermute` hops, each overlapped with the flash
  kernel on the resident chunk; chunk outputs combine exactly via
  logsumexp stats (flash_attention_with_lse). Same bytes, lower peak
  memory (K/V never materialize fully), pays n kernel dispatches.
  Forward-only on the flash path (the stats wrapper bypasses the
  custom VJP); differentiable on the einsum path. For meshes where
  full K/V per chip is too large (>8 chips / multi-slice).

Integration: `with sequence_sharding(mesh):` around the *tracing* of a
jitted model makes every eligible `ops.dot_product_attention` call
(self-attention: Sq == Sk, no mask, S divisible by the axis size) route
through here, including `causal=True` (global-position masking — see
`sequence_parallel_attention`). On a 1-sized axis it falls back to the
plain path unchanged.
"""
from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "sequence_sharding",
    "current_sequence_sharding",
    "sequence_parallel_attention",
]


@dataclass(frozen=True)
class SequenceShardingConfig:
    mesh: Mesh
    axis: str = "space"
    batch_axis: str = "data"
    impl: str = "allgather"  # or "ring"
    causal_layout: str = "blocked"  # or "striped" (zigzag, balanced)


_CTX: ContextVar[SequenceShardingConfig | None] = ContextVar(
    "gmtpu_sequence_sharding", default=None
)


@contextmanager
def sequence_sharding(
    mesh: Mesh,
    axis: str = "space",
    batch_axis: str = "data",
    impl: str = "allgather",
    causal_layout: str = "blocked",
):
    """Route eligible attention calls through sequence-parallel shard_map.

    Must wrap the TRACE of the jitted function (define or first-call the
    jit inside this context); a function already traced without the
    context will not retrace.

    `causal_layout="striped"` (allgather impl, causal only): zigzag
    half-block ownership balancing the causal triangle exactly across
    chips — see `sequence_parallel_attention`.
    """
    if impl not in ("allgather", "ring"):
        raise ValueError(f"impl must be 'allgather' or 'ring', got {impl!r}")
    if causal_layout not in ("blocked", "striped"):
        raise ValueError(
            f"causal_layout must be 'blocked' or 'striped', got {causal_layout!r}"
        )
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    token = _CTX.set(
        SequenceShardingConfig(mesh, axis, batch_axis, impl, causal_layout)
    )
    try:
        yield
    finally:
        _CTX.reset(token)


def current_sequence_sharding() -> SequenceShardingConfig | None:
    return _CTX.get()


def _combine_chunks(acc_out, acc_lse, out, lse):
    """Merge a new chunk's (normalized out, lse) into the running pair."""
    new_lse = jnp.logaddexp(acc_lse, lse)
    w_acc = jnp.exp(acc_lse - new_lse)[..., None]
    w_new = jnp.exp(lse - new_lse)[..., None]
    return acc_out * w_acc + out.astype(acc_out.dtype) * w_new, new_lse


def _chunk_attention_with_lse(q, k, v, num_heads, scale, upcast, use_flash, mask=None):
    """Local (out, lse) for one K/V chunk; flash on TPU, einsum elsewhere.

    q: (B, Sq, H*D); k/v: (B, Sc, H*D). Returns out (B, Sq, H, D) and lse
    (B, Sq, H) in the natural-log domain, aligned for per-head chunk
    combination. `mask` (bool (Sq, Sc), True = attend) forces the einsum
    path (the flash stats wrapper has no mask input); masked scores sit at
    finfo.min so a fully-masked chunk's lse weights it to exactly 0 in
    `_combine_chunks` without inf/nan arithmetic.
    """
    from .attention import _on_tpu, _pick_blocks, resolve_use_flash
    from .flash_attention import flash_attention_with_lse

    b, sq, inner = q.shape
    sc = k.shape[1]
    head_dim = inner // num_heads
    if mask is None and resolve_use_flash(sq, head_dim, use_flash):
        qf = q.reshape(b, sq, num_heads, head_dim).transpose(0, 2, 1, 3)
        kf = k.reshape(b, sc, num_heads, head_dim).transpose(0, 2, 1, 3)
        vf = v.reshape(b, sc, num_heads, head_dim).transpose(0, 2, 1, 3)
        block_q, block_k, _ = _pick_blocks(sq, head_dim)
        out, lse = flash_attention_with_lse(
            qf.reshape(b * num_heads, sq, head_dim),
            kf.reshape(b * num_heads, sc, head_dim),
            vf.reshape(b * num_heads, sc, head_dim),
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=not _on_tpu(), upcast=upcast,
        )
        out = out.reshape(b, num_heads, sq, head_dim).transpose(0, 2, 1, 3)
        return out, lse.reshape(b, num_heads, sq).transpose(0, 2, 1)

    qh = q.reshape(b, sq, num_heads, head_dim)
    kh = k.reshape(b, sc, num_heads, head_dim)
    if upcast:
        qh = qh.astype(jnp.float32)
        kh = kh.astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[None, None], scores, jnp.finfo(scores.dtype).min)
    lse = jax.scipy.special.logsumexp(scores, axis=-1)  # (B, H, Sq)
    probs = jnp.exp(scores - lse[..., None]).astype(q.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v.reshape(b, sc, num_heads, head_dim)
    )
    return out, lse.transpose(0, 2, 1)


def _causal_chunk_mask(sq_local, sc, q_offset, k_offset):
    """Boolean (sq_local, sc) mask: global q row >= global k column.

    One formula covers every chunk class in the causal sharded paths:
    past chunks (all True), the diagonal chunk (lower-triangular), and
    future chunks (all False). Offsets are traced per-chip values
    (`lax.axis_index` products), so the SPMD program stays uniform.
    """
    q_idx = q_offset + jnp.arange(sq_local)[:, None]
    k_idx = k_offset + jnp.arange(sc)[None, :]
    return q_idx >= k_idx


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    cfg: SequenceShardingConfig,
    *,
    scale: float,
    upcast: bool = False,
    use_flash: bool | None = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Self-attention with Q/K/V sequence-sharded over cfg.axis.

    q, k, v: (B, S, H*D) GLOBAL arrays (inside jit they may carry any
    sharding; shard_map re-lays them out to P(batch?, axis, None)).

    `causal=True` (the AR-transformer long-context training case — the
    reference caps its transformer at what one GPU's S² attention holds,
    networks/nets/transformer.py) masks by GLOBAL position: chip r owns q
    rows [r*S/n, (r+1)*S/n) and attends keys <= its global row. Both
    impls take the einsum path for the masked work (the flash kernel's
    causal mode has no row-offset input), which is the right tool at AR
    sequence lengths; allgather stays fully differentiable, and the ring
    differentiates too (its masked chunks are einsum — grad-parity
    tested). With `cfg.causal_layout="blocked"` chips own uniform row
    blocks, so late ranks attend more keys than early ones — the classic
    causal load imbalance (worst chip attends ~2x the balanced-ideal key
    count). `"striped"` (allgather impl) fixes it exactly: zigzag
    half-block ownership {r, 2n-1-r} makes every chip's attended-key
    total the constant S+S/(2n), at the cost of two tiny Q/out ppermutes.
    Note today's masked path computes the dense rectangle either way
    (einsum applies the mask after the matmul), so the layouts currently
    tie on wall-clock; striping is what makes a future block-skipping
    masked kernel scale without a straggler chip, and it costs ~nothing.
    """
    from .attention import dot_product_attention

    n = cfg.mesh.shape[cfg.axis]
    b, s, _ = q.shape
    if n == 1:
        return dot_product_attention(
            q, k, v, num_heads, scale=scale, upcast=upcast,
            use_flash=use_flash, seq_shard=False, causal=causal,
        )

    data = cfg.batch_axis
    shard_b = (
        data in cfg.mesh.axis_names
        and cfg.mesh.shape[data] > 1
        and b % cfg.mesh.shape[data] == 0
    )
    spec = P(data if shard_b else None, cfg.axis, None)

    sq_l = s // n

    striped = causal and cfg.causal_layout == "striped" and cfg.impl == "allgather"
    if striped and sq_l % 2:
        raise ValueError(
            f"striped causal layout needs an even local sequence ({sq_l})"
        )

    if cfg.impl == "allgather":

        def local(ql, kl, vl):
            kg = jax.lax.all_gather(kl, cfg.axis, axis=1, tiled=True)
            vg = jax.lax.all_gather(vl, cfg.axis, axis=1, tiled=True)
            if not causal:
                return dot_product_attention(
                    ql, kg, vg, num_heads, scale=scale, upcast=upcast,
                    use_flash=use_flash, seq_shard=False,
                )
            r = jax.lax.axis_index(cfg.axis)
            if not striped:
                mask = _causal_chunk_mask(sq_l, s, r * sq_l, 0)
                out, _ = _chunk_attention_with_lse(
                    ql, kg, vg, num_heads, scale, upcast, use_flash, mask=mask
                )
                return out.astype(ql.dtype).reshape(ql.shape[0], sq_l, -1)

            # Striped (zigzag) causal layout: blocked ownership makes the
            # last chip attend ~2x the balanced-ideal key count (rows
            # [s-s/n, s) see every key; rows [0, s/n) see almost none).
            # Split the sequence into 2n half-blocks H_0..H_{2n-1} (h rows
            # each); chip r computes H_r AND H_{2n-1-r}, whose attended-key
            # totals sum to the constant (2n-1+1)*h rows — every chip does
            # IDENTICAL causal work. Q halves are re-homed with two
            # ppermutes (2*h*d bytes/chip each way — negligible next to the
            # (n-1)/n*2*s*d K/V all-gather), outputs ppermute back, K/V
            # stay in natural order (masks encode global positions), and
            # everything is ppermute/einsum so AD works end-to-end.
            h = sq_l // 2

            def owner(j: int) -> int:  # zigzag owner of half-block j
                return j if j < n else 2 * n - 1 - j

            perm_lo = [(src, owner(2 * src)) for src in range(n)]
            perm_hi = [(src, owner(2 * src + 1)) for src in range(n)]
            q_lo = jax.lax.ppermute(ql[:, :h], cfg.axis, perm_lo)
            q_hi = jax.lax.ppermute(ql[:, h:], cfg.axis, perm_hi)
            # chip r now holds half-blocks {r, 2n-1-r}: the even-indexed
            # one arrived via perm_lo, the odd one via perm_hi
            j_even = jnp.where(r % 2 == 0, r, 2 * n - 1 - r)
            j_odd = jnp.where(r % 2 == 0, 2 * n - 1 - r, r)
            qz = jnp.concatenate([q_lo, q_hi], axis=1)
            q_idx = jnp.concatenate(
                [j_even * h + jnp.arange(h), j_odd * h + jnp.arange(h)]
            )
            mask = q_idx[:, None] >= jnp.arange(s)[None, :]
            out, _ = _chunk_attention_with_lse(
                qz, kg, vg, num_heads, scale, upcast, use_flash, mask=mask
            )
            out = out.astype(ql.dtype).reshape(ql.shape[0], sq_l, -1)
            # route outputs back to the natural blocked layout
            inv_lo = [(dst, src) for src, dst in perm_lo]
            inv_hi = [(dst, src) for src, dst in perm_hi]
            o_lo = jax.lax.ppermute(out[:, :h], cfg.axis, inv_lo)
            o_hi = jax.lax.ppermute(out[:, h:], cfg.axis, inv_hi)
            return jnp.concatenate([o_lo, o_hi], axis=1)

    else:  # ring

        def local(ql, kl, vl):
            r = jax.lax.axis_index(cfg.axis)
            diag_mask = _causal_chunk_mask(sq_l, sq_l, r * sq_l, r * sq_l) if causal else None
            out, lse = _chunk_attention_with_lse(
                ql, kl, vl, num_heads, scale, upcast, use_flash, mask=diag_mask
            )
            acc = (out.astype(jnp.float32), lse)
            perm = [(i, (i + 1) % n) for i in range(n)]

            def body(i, carry):
                acc_out, acc_lse, kc, vc = carry
                kc = jax.lax.ppermute(kc, cfg.axis, perm)
                vc = jax.lax.ppermute(vc, cfg.axis, perm)
                if causal:
                    # after hop i+1 the resident chunk originated at rank
                    # (r - i - 1) mod n; mask by global position (future
                    # chunks go fully masked and combine with weight 0)
                    src = jnp.mod(r - i - 1, n)
                    mask_i = _causal_chunk_mask(sq_l, sq_l, r * sq_l, src * sq_l)
                else:
                    mask_i = None
                out_i, lse_i = _chunk_attention_with_lse(
                    ql, kc, vc, num_heads, scale, upcast, use_flash, mask=mask_i
                )
                acc_out, acc_lse = _combine_chunks(acc_out, acc_lse, out_i, lse_i)
                return acc_out, acc_lse, kc, vc

            acc_out, acc_lse, _, _ = jax.lax.fori_loop(
                0, n - 1, body, (*acc, kl, vl)
            )
            b_l = ql.shape[0]
            return acc_out.astype(ql.dtype).reshape(b_l, sq_l, -1)

    fn = shard_map(
        local, mesh=cfg.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
