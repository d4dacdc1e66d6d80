"""Block-size sweep for the Pallas flash-attention forward pass.

Forward-only is the one mode where flash still trails XLA at 1024/4096
(training fwd+bwd already wins). Sweeps (block_q, block_k) on the two
flagship shapes with the scan-difference timer from bench_attention.
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

from generativemodels_tpu.ops.flash_attention import flash_attention

N_SHORT, N_LONG = 8, 40

# (label, bh, seq, head_dim, [(block_q, block_k), ...])
CASES = [
    ("2d_lvl1", 128, 1024, 256, [(256, 512), (512, 512), (256, 1024), (512, 1024), (128, 1024)]),
    ("mid_4k", 4, 4096, 64, [(256, 512), (512, 512), (256, 1024), (512, 1024), (256, 4096), (512, 2048)]),
    # 3D 128^3 mid-level attention: ~40% of a DDIM sample after the conv
    # decomposition landed; bh=2 at sampling batch 1
    ("3d_32k", 2, 32768, 64, [(256, 1024), (512, 1024), (512, 2048), (1024, 1024), (1024, 2048), (2048, 2048), (512, 4096)]),
]


def timeit(make_scanned, trials=3):
    short, long = make_scanned(N_SHORT), make_scanned(N_LONG)
    float(short())
    float(long())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(short())
        t1 = time.perf_counter()
        float(long())
        t2 = time.perf_counter()
        best = min(best, max((t2 - t1) - (t1 - t0), 1e-9) / (N_LONG - N_SHORT) * 1e3)
    return best


def main() -> None:
    results = []
    for label, bh, seq, d, blocks in CASES:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (bh, seq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, seq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, seq, d), jnp.bfloat16)
        scale = 1.0 / d**0.5
        for bq, bk in blocks:
            attn = functools.partial(
                flash_attention, scale=scale, block_q=bq, block_k=bk
            )

            def make_fwd(n, _k=k, _v=v, _q=q, _attn=attn):
                return jax.jit(
                    lambda: jnp.sum(
                        jax.lax.scan(
                            lambda c, _: (_attn(c, _k, _v), None), _q, None, length=n
                        )[0].astype(jnp.float32)
                    )
                )

            try:
                ms = timeit(make_fwd)
            except Exception as e:  # VMEM overflow etc.
                ms = None
                print(f"{label} bq={bq} bk={bk}: FAILED {type(e).__name__}", flush=True)
                continue
            rec = {"shape": label, "block_q": bq, "block_k": bk, "fwd_ms": round(ms, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results_flash_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
