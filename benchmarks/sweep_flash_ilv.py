"""Sweep the flash kernel's (ilv_q, ilv_k) interleave factors on-chip.

Runs the REAL `flash_attention` (not a probe re-implementation) at the
flagship shapes with the shipped auto block sizes, over interleave
splits of the forward tile. Writes benchmarks/results_flash_ilv.json;
the winner per shape goes into ops/attention.py `_pick_blocks`.

Usage: python benchmarks/sweep_flash_ilv.py [shape ...]
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

SHAPES = {
    # label: (bh, seq, d) — 3D 128^3 level-3 self-attn; 2D tutorial attn
    "3d_32k_d64": (2, 32768, 64),
    "2d_1024_d256": (128, 1024, 256),
}
ILVS = [(1, 1), (1, 2), (2, 1), (2, 2), (1, 4), (4, 1), (2, 4), (4, 2)]
# (block_q, block_k, ilv_q, ilv_k) rows probing bigger tiles WITH splits:
# bk=2048 split 2/4-way keeps chunk matmuls at the proven sizes while
# halving grid steps (fewer acc inits/epilogues, fewer DMA descriptors).
BLOCK_VARIANTS = [
    (1024, 2048, 1, 2),
    (1024, 2048, 1, 4),
    (1024, 2048, 2, 2),
    (2048, 1024, 2, 1),
]
N_SHORT, N_LONG = 2, 6


def timeit(fn, trials: int = 5) -> float:
    """Scan-difference timer: median of (long - short) per-call ms."""
    def make(n):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                return fn(c, k, v).astype(c.dtype), None
            y, _ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(y.astype(jnp.float32))
        return run

    short, long = make(N_SHORT), make(N_LONG)
    float(short(*ARGS)); float(long(*ARGS))
    diffs = []
    for _ in range(trials):
        t0 = time.perf_counter(); float(short(*ARGS))
        t1 = time.perf_counter(); float(long(*ARGS))
        t2 = time.perf_counter()
        diffs.append(max((t2 - t1) - (t1 - t0), 1e-9) / (N_LONG - N_SHORT) * 1e3)
    diffs.sort()
    return diffs[len(diffs) // 2]


def main() -> None:
    global ARGS
    selected = sys.argv[1:] or list(SHAPES)
    results = []
    for label in selected:
        bh, seq, d = SHAPES[label]
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (bh, seq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, seq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, seq, d), jnp.bfloat16)
        ARGS = (q, k, v)
        scale = 1.0 / d**0.5
        bq0, bk0, _ = _pick_blocks(seq, d)  # the shipped dispatch blocks
        combos = [(bq0, bk0, iq, ik) for iq, ik in ILVS]
        combos += [c for c in BLOCK_VARIANTS if c[0] <= seq and c[1] <= seq]
        base_ms = None
        for bq, bk, iq, ik in combos:
            fn = lambda q, k, v, bq=bq, bk=bk, iq=iq, ik=ik: flash_attention(
                q, k, v, scale=scale, block_q=bq, block_k=bk, ilv=(iq, ik)
            )
            ms = timeit(fn)
            entry = {
                "shape": label, "block_q": bq, "block_k": bk,
                "ilv_q": iq, "ilv_k": ik, "fwd_ms": round(ms, 3),
            }
            if (bq, bk, iq, ik) == (bq0, bk0, 1, 1):
                base_ms = ms
            entry["speedup_vs_mono"] = round(base_ms / ms, 3) if base_ms else None
            print(json.dumps(entry))
            results.append(entry)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_flash_ilv.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
