"""Fused vs split flash backward on-chip (round 4).

The split backward runs 7 block_q x block_k matmul passes (dq kernel:
s, dp, dq; dkv kernel: s, dv, dp, dk) — s and dp are recomputed in both
kernels. The fused kernel (GMTPU_FLASH_FUSED_BWD=1) shares them (5
passes) at the cost of writing num_kj partial-dq f32 slabs to HBM plus
one XLA sum. Theoretical ceiling if matmul-bound: 7/5 = 1.4x.

Measurement method: the scan-based long/short differential from
bench_attention.py. Two earlier attempts mis-measured through the axon
tunnel: (a) repeat calls with bit-identical input buffers are
DEDUPLICATED by the tunnel (a same-input 8k matmul loop reports
12 PFLOP/s; varied inputs report 92 TFLOP/s), and (b) per-call dispatch
costs ~7 ms and ramps over the first call(s) per executable, swamping
ms-scale kernels and penalising whichever config is measured first.
The on-device scan chain (carry threads dq back into q, so every
iteration's inputs differ) sidesteps both; the long-short difference
cancels dispatch + fetch RTT.

Shapes: the 3D train step's attention (bh=2, 32k, d64 — 21.5% of the
remat-free step is bwd kernels) and the 2D train step's (bh=128, 1024,
d256).

Writes benchmarks/results_fused_bwd.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from generativemodels_tpu.ops.attention import _pick_blocks
from generativemodels_tpu.ops.flash_attention import flash_attention

SHAPES = [
    ("mid_4k", 4, 4096, 64),
    ("2d_lvl1", 128, 1024, 256),
    ("3d_32k", 2, 32768, 64),
]

N_SHORT, N_LONG = 4, 20


def _timeit(make_scanned, trials: int = 5) -> float:
    short = make_scanned(N_SHORT)
    long = make_scanned(N_LONG)
    float(short())  # compile+warm
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


def bench_one(bh, s, d, fused: bool) -> float:
    os.environ["GMTPU_FLASH_FUSED_BWD"] = "1" if fused else "0"
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, s, d), jnp.bfloat16)
    block_q, block_k, _ = _pick_blocks(s, d)
    scale = 1.0 / d**0.5

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, scale=scale, block_q=block_q, block_k=block_k
            ).astype(jnp.float32)
            ** 2
        )

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def make_scanned(n, _q=q, _k=k, _v=v):
        def body(c, _):
            dq, dk, dv = grad(c, _k, _v)
            # thread dq back into q: inputs vary every step, so the
            # tunnel's identical-input dedup can never trigger
            return (c + 1e-3 * dq).astype(c.dtype), None

        return jax.jit(
            lambda: jnp.sum(
                jax.lax.scan(body, _q, None, length=n)[0].astype(jnp.float32)
            )
        )

    return _timeit(make_scanned)


def main():
    rows = []
    for name, bh, s, d in SHAPES:
        split_ms = bench_one(bh, s, d, fused=False)
        fused_ms = bench_one(bh, s, d, fused=True)
        row = {
            "shape": name,
            "bh": bh,
            "seq": s,
            "head_dim": d,
            "split_fwd_bwd_ms": round(split_ms, 3),
            "fused_fwd_bwd_ms": round(fused_ms, 3),
            "speedup": round(split_ms / fused_ms, 3),
        }
        rows.append(row)
        print(row, flush=True)
        # write incrementally: remote compiles can outlive a driver timeout
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results_fused_bwd.json"
        )
        with open(out, "w") as f:
            json.dump({"rows": rows, "backend": jax.default_backend()}, f, indent=1)


if __name__ == "__main__":
    main()
