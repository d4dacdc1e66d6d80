"""Probe: max-free (clamped) flash softmax vs online-max baseline.

The online-softmax running max costs a per-tile row-max reduction plus a
cross-block alpha rescale of acc/l (VPU work between the two MXU matmuls).
In the log2 domain the f32 exp2 range is wide enough that clamping scores
to [-120, 80] is safe for any GroupNorm'd model, so `no_max=True` drops
that bookkeeping entirely. This measures whether it matters at the
flagship shapes (fwd-only = the sampling path; fwd+bwd = training).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gmtpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from generativemodels_tpu.ops.flash_attention import flash_attention

SHAPES = [
    ("3d_32k_d64", 4, 32768, 64),
    ("2d_1024_d256", 128, 1024, 256),
    ("mid_4k_d64", 4, 4096, 64),
]

N_SHORT, N_LONG = 8, 72


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
    key = jax.random.PRNGKey(0)
    results = []
    for label, bh, seq, d in SHAPES:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (bh, seq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, seq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, seq, d), jnp.bfloat16)
        row = {"label": label, "bh": bh, "seq": seq, "d": d}

        for nm in (False, True):
            fa = functools.partial(flash_attention, scale=d ** -0.5, no_max=nm)

            def make_fwd(n, fa=fa):
                @jax.jit
                def run(q, k, v):
                    def body(c, _):
                        o = fa(q + c * 0, k, v)
                        return jnp.float32(o[0, 0, 0]) * 0.0, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                    return c
                return lambda: run(q, k, v)

            def make_fb(n, fa=fa):
                def loss(q, k, v):
                    return jnp.sum(fa(q, k, v).astype(jnp.float32))

                g = jax.grad(loss, argnums=(0, 1, 2))

                @jax.jit
                def run(q, k, v):
                    def body(c, _):
                        dq, dk, dv = g(q + c * 0, k, v)
                        return jnp.float32(dq[0, 0, 0]) * 0.0, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                    return c
                return lambda: run(q, k, v)

            tag = "nomax" if nm else "base"
            row[f"fwd_ms_{tag}"] = _timeit(make_fwd)
            row[f"fb_ms_{tag}"] = _timeit(make_fb)

        # numerics check at this shape
        o0 = flash_attention(q, k, v, scale=d ** -0.5, no_max=False)
        o1 = flash_attention(q, k, v, scale=d ** -0.5, no_max=True)
        row["max_abs_diff"] = float(
            jnp.max(jnp.abs(o0.astype(jnp.float32) - o1.astype(jnp.float32)))
        )
        row["fwd_speedup"] = row["fwd_ms_base"] / row["fwd_ms_nomax"]
        row["fb_speedup"] = row["fb_ms_base"] / row["fb_ms_nomax"]
        results.append(row)
        print(json.dumps(row))

    with open("benchmarks/results_nomax_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
