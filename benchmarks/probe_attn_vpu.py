"""Probe: is the flash kernel VPU-bound on softmax at the 3D shape?

At (bh=2, seq=32768, d=64) the HLO-correlated profile puts the four
attention custom-calls at 47% of per-sample device time (~10 ms each),
while the per-program MXU work (QK^T + PV at d=64 half-fill) is only
~2.8 us of the ~10 us per (1024,1024) tile — the exp/max/sum chain over
the f32 score tile plausibly dominates. Variants:

  base     - the production kernel (ops/flash_attention.py)
  prescale - fold the softmax scale into q before the kernel (one fewer
             VPU pass over the score tile)
  bf16p    - compute p = exp(s - m) and the PV operand in bf16
             (VPU elementwise at 2x rate; m/l stay f32)
  both     - prescale + bf16p

Each variant checks max|out - einsum| before timing. Writes
results_attn_vpu.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generativemodels_tpu.ops.flash_attention import NEG_INF, _round_up, flash_attention

BH, SEQ, D = 2, 32768, 64
BQ, BK = 1024, 1024
N_SHORT, N_LONG = 8, 40


def _fwd_kernel_var(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                    *, scale, prescaled, bf16_p):
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if not prescaled:
        s = s * scale

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    if bf16_p:
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        l_ref[...] = l_ref[...] * alpha + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32
        )
    else:
        p = jnp.exp(s - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new

    @pl.when(kj == num_k - 1)
    def _():
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def flash_var(q, k, v, *, scale, prescaled, bf16_p):
    bh, sq, d = q.shape
    sk = k.shape[1]
    if prescaled:
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    grid = (bh, sq // BQ, sk // BK)
    kernel = functools.partial(
        _fwd_kernel_var, scale=scale, prescaled=prescaled, bf16_p=bf16_p
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, BK, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, BK, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BQ, d), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def _timeit(make_scanned, trials: int = 5) -> float:
    short = make_scanned(N_SHORT)
    long = make_scanned(N_LONG)
    float(short())
    float(long())
    diffs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(short())
        t1 = time.perf_counter()
        float(long())
        t2 = time.perf_counter()
        diffs.append(max((t2 - t1) - (t1 - t0), 1e-9) / (N_LONG - N_SHORT) * 1e3)
    diffs.sort()
    return diffs[len(diffs) // 2]


def main() -> None:
    scale = 1.0 / D**0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (BH, SEQ, D), jnp.bfloat16)
    k = jax.random.normal(kk, (BH, SEQ, D), jnp.bfloat16)
    v = jax.random.normal(kv, (BH, SEQ, D), jnp.bfloat16)

    # reference on a small slice (full einsum at 32k OOMs)
    sl = 2048
    qs, ks, vs = q[:, :sl], k[:, :sl], v[:, :sl]
    sref = jnp.einsum("bqd,bkd->bqk", qs.astype(jnp.float32), ks.astype(jnp.float32)) * scale
    ref = jnp.einsum(
        "bqk,bkd->bqd", jax.nn.softmax(sref, axis=-1), vs.astype(jnp.float32)
    )

    variants = {
        "base": None,
        "prescale": dict(prescaled=True, bf16_p=False),
        "bf16p": dict(prescaled=False, bf16_p=True),
        "both": dict(prescaled=True, bf16_p=True),
    }
    selected = sys.argv[1:] or list(variants)
    results = []
    for name in selected:
        opts = variants[name]
        if opts is None:
            fn = lambda q, k, v: flash_attention(
                q, k, v, scale=scale, block_q=BQ, block_k=BK
            )
        else:
            fn = lambda q, k, v, o=opts: flash_var(q, k, v, scale=scale, **o)

        small = jax.jit(fn)(qs, ks, vs).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(small - ref)))

        def make(n, fn=fn):
            @jax.jit
            def run(q, k, v):
                def body(c, _):
                    return fn(c, k, v).astype(q.dtype), None
                y, _ = jax.lax.scan(body, q, None, length=n)
                return jnp.sum(y.astype(jnp.float32))
            return lambda: run(q, k, v)

        ms = _timeit(make)
        rec = {"variant": name, "ms": round(ms, 3), "maxdiff_vs_einsum": round(err, 5)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results_attn_vpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
