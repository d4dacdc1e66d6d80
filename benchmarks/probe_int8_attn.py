"""Probe raw int8 vs bf16 MXU rates at the flash-attention tile shapes.

The 3D headline's attention kernel is at the measured MXU floor of its
bf16 schedule (results_overlap.json mxu_only ~= full). v5e's int8 MXU
path is nominally 2x bf16; whether that materialises at the kernel's
actual tile shapes — scores (1024,64)@(64,2048) with its K=64
contraction, and PV (1024,2048)@(2048,64) — decides if an int8-scores
flash variant is worth building. This probes the raw batched matmuls
through XLA (not Pallas): if XLA's int8 dot shows no win at these
shapes, a Pallas int8 kernel won't either.

Writes benchmarks/results_int8_attn.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

# batched to amortise dispatch; B chosen so int32 outputs stay ~0.5 GB
CASES = {
    # label: (B, M, K, N) — scores tile and PV tile of the 32k/d64 kernel
    "scores_1024x64x2048": (64, 1024, 64, 2048),
    "pv_1024x2048x64": (64, 1024, 2048, 64),
    # transposed forms: out^T = v^T @ probs^T and scores^T = k @ q^T.
    # Both put the tile's wide dim on N (the MXU's 128-lane output axis)
    # and the narrow d=64 on M (which streams) — if these run near peak,
    # a transposed flash forward lifts the PV bottleneck.
    "pvT_64x2048x1024": (64, 64, 2048, 1024),
    "scoresT_2048x64x1024": (64, 2048, 64, 1024),
}
N_SHORT, N_LONG = 2, 8


def timeit(fn, args, trials: int = 5) -> float:
    def make(n):
        @jax.jit
        def run(x, w):
            def body(c, _):
                y = fn(c, w)
                # max over the output fuses into the dot's epilogue and —
                # unlike sum — has no algebraic rewrite through the
                # matmul (XLA folded sum(x@w) -> x@sum(w) and a *0 /
                # column-slice consumer to nothing: the first two probe
                # runs measured exactly that as 0.0 ms rows). The bump is
                # data-dependent but always 0 at these magnitudes.
                s = y.max(axis=2)
                thresh = jnp.array(
                    2**30 if s.dtype == jnp.int32 else 1e30, s.dtype)
                return c + (s > thresh).astype(c.dtype)[..., None], None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
        return run

    short, long = make(N_SHORT), make(N_LONG)
    float(short(*args)); float(long(*args))
    diffs = []
    for _ in range(trials):
        t0 = time.perf_counter(); float(short(*args))
        t1 = time.perf_counter(); float(long(*args))
        t2 = time.perf_counter()
        diffs.append(max((t2 - t1) - (t1 - t0), 1e-9) / (N_LONG - N_SHORT) * 1e3)
    diffs.sort()
    return diffs[len(diffs) // 2]


def main() -> None:
    key = jax.random.PRNGKey(0)
    results = []
    for label, (b, m, k, n) in CASES.items():
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(label) % 2**31))
        xf = jax.random.normal(kx, (b, m, k), jnp.bfloat16)
        wf = jax.random.normal(kw, (b, k, n), jnp.bfloat16)
        xi = (jax.random.normal(kx, (b, m, k)) * 16).astype(jnp.int8)
        wi = (jax.random.normal(kw, (b, k, n)) * 16).astype(jnp.int8)

        def mm_bf16(x, w):
            return jax.lax.batch_matmul(x, w)

        def mm_int8(x, w):
            return jax.lax.dot_general(
                x, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)

        ms_bf16 = timeit(mm_bf16, (xf, wf))
        try:
            ms_int8 = timeit(mm_int8, (xi, wi))
            err = None
        except Exception as e:  # int8 dot may not lower on this build
            ms_int8, err = None, repr(e)[:200]
        entry = {
            "case": label, "bf16_ms": round(ms_bf16, 3),
            "int8_ms": round(ms_int8, 3) if ms_int8 else None,
            "int8_speedup": round(ms_bf16 / ms_int8, 3) if ms_int8 else None,
            "error": err,
        }
        print(json.dumps(entry))
        results.append(entry)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_int8_attn.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
