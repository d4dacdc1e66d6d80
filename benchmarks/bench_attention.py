"""Attention microbenchmark: XLA einsum path vs Pallas flash kernel.

Measures forward and forward+backward wall time on the current backend for
the shapes the flagship configs actually hit:
  - 2D tutorial train (bench.py): seq 1024 / 256, head_dim 256, bh=128, bf16
  - 3D 128^3 DDIM (bench_3d_ddim.py): seq 32768, head_dim 64, bh=2, bf16
  - plus the 4096 midpoint the kernel must win to be useful at 3D 64^3.

Prints one JSON line per (shape, path, mode) with times in ms, then a
summary table of flash/einsum speedups.
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

from generativemodels_tpu.ops import dot_product_attention

# (label, bh_batch, heads, seq, head_dim)
SHAPES = [
    ("2d_lvl2", 128, 1, 256, 256),
    ("2d_lvl1", 128, 1, 1024, 256),
    ("mid_4k", 2, 2, 4096, 64),
    ("3d_32k", 2, 2, 32768, 64),
    # zoo-bundle attention shapes (wide heads, above the d=256 dispatch
    # gate): brain bundle level-1 (10x14x10 latent, d=512) and the CXR
    # bundle level-1 (32x32 latent, d=512) — measured to decide whether
    # the auto-dispatch gate should admit d>256 (VERDICT round-2 weak 5)
    ("bundle_d512", 1, 1, 1408, 512),
    ("cxr_d512", 1, 1, 1024, 512),
]


N_SHORT, N_LONG = 8, 72


def _timeit(make_scanned, trials: int = 5) -> float:
    """Per-call ms from the difference of two on-device scan lengths.

    Through the axon tunnel, block_until_ready returns before remote
    execution completes and per-call host dispatch jitter swamps small
    kernels; a lax.scan keeps the serial chain on-device in one dispatch,
    and a host scalar fetch truly synchronises. The long/short difference
    cancels dispatch + fetch RTT; median over trials rejects the tunnel's
    multi-ms latency spikes (min would bias a noisy difference low).
    """
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


def main() -> None:
    selected = sys.argv[1:]
    results = []
    for label, b, heads, seq, d in SHAPES:
        if selected and label not in selected:
            continue
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        shape = (b, seq, heads * d)
        q = jax.random.normal(kq, shape, jnp.bfloat16)
        k = jax.random.normal(kk, shape, jnp.bfloat16)
        v = jax.random.normal(kv, shape, jnp.bfloat16)

        for flash in (False, True):
            if not flash and seq > 8192:
                continue  # einsum path OOMs / is pointless at 32k
            attn = functools.partial(
                dot_product_attention, num_heads=heads, use_flash=flash
            )

            def loss(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

            grad = jax.grad(loss, argnums=(0, 1, 2))

            def make_fwd(n, _q=q, _k=k, _v=v):
                f = jax.jit(
                    lambda: jnp.sum(
                        jax.lax.scan(
                            lambda c, _: (attn(c, _k, _v), None),
                            _q,
                            None,
                            length=n,
                        )[0].astype(jnp.float32)
                    )
                )
                return f

            def make_bwd(n, _q=q, _k=k, _v=v):
                f = jax.jit(
                    lambda: jnp.sum(
                        jax.lax.scan(
                            lambda c, _: (grad(c, _k, _v)[0], None),
                            _q,
                            None,
                            length=n,
                        )[0].astype(jnp.float32)
                    )
                )
                return f

            fwd_ms = _timeit(make_fwd)
            bwd_ms = _timeit(make_bwd)
            rec = {
                "shape": label,
                "bh": b * heads,
                "seq": seq,
                "head_dim": d,
                "path": "flash" if flash else "einsum",
                "fwd_ms": round(fwd_ms, 3),
                "fwd_bwd_ms": round(bwd_ms, 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    by_shape = {}
    for r in results:
        by_shape.setdefault(r["shape"], {})[r["path"]] = r
    print("\nshape      seq    fwd flash/einsum   fwd+bwd flash/einsum")
    for label, paths in by_shape.items():
        if "einsum" in paths and "flash" in paths:
            f, e = paths["flash"], paths["einsum"]
            print(
                f"{label:10s} {f['seq']:6d} "
                f"{e['fwd_ms'] / max(f['fwd_ms'], 1e-9):10.2f}x "
                f"{e['fwd_bwd_ms'] / max(f['fwd_bwd_ms'], 1e-9):16.2f}x"
            )

    out_path = os.path.join(os.path.dirname(__file__), "results_attention.json")
    if selected:  # partial run: merge into existing records
        try:
            old = json.load(open(out_path))["results"]
        except Exception:
            old = []
        merged = {(r["shape"], r["path"]): r for r in old}
        for r in results:
            merged[(r["shape"], r["path"])] = r
        results = list(merged.values())
    with open(out_path, "w") as fh:
        json.dump({"backend": jax.default_backend(), "results": results}, fh, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
