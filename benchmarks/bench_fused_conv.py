"""Fused GN/SiLU/conv3d/residual Pallas kernel vs the XLA op chain.

Times the ResNet-block inner op chain
    y = conv3x3x3(silu(groupnorm(x))) + bias + residual
at the 3D UNet level shapes, comparing
  a) the current XLA lowering (GroupNorm fusions + depth-decomposed conv
     `_conv3d_via_2d` + adds — what the model runs today), vs
  b) `ops/fused_conv.fused_norm_silu_conv3d` (one HBM pass; the GN
     statistics reduce is the only op left outside).

Writes results_fused_conv.json; run with variant labels to subset.
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

from generativemodels_tpu.networks.blocks.convolutions import _conv3d_via_2d
from generativemodels_tpu.ops.fused_conv import (
    fold_groupnorm_affine,
    fused_norm_silu_conv3d,
)

# (label, D=H=W, C) — 3D UNet levels from bench_3d_ddim config
SHAPES = [
    ("lvl0_128_c32", 128, 32),
    ("lvl1_64_c64", 64, 64),
    ("lvl2_32_c128", 32, 128),
]
GROUPS = 8
N_SHORT, N_LONG = 4, 16


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
    selected = sys.argv[1:]
    results = []
    for label, size, c in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (1, size, size, size, c), jnp.bfloat16)
        w = jax.random.normal(ks[1], (3, 3, 3, c, c), jnp.bfloat16) * 0.05
        gamma = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1 + 1.0
        beta = jax.random.normal(ks[3], (c,), jnp.float32) * 0.1
        bias = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
        res = jax.random.normal(ks[5], (1, size, size, size, c), jnp.bfloat16)

        def xla_chain(x, res):
            xf = x.astype(jnp.float32)
            xg = xf.reshape(1, size, size, size, GROUPS, c // GROUPS)
            mean = xg.mean(axis=(1, 2, 3, 5), keepdims=True)
            var = ((xg - mean) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
            xn = ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(x.shape)
            xn = xn * gamma + beta
            xa = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
            y = _conv3d_via_2d(xa, w, (1, 1, 1), (1, 1, 1))
            return (y + bias + res.astype(y.dtype)).astype(x.dtype)

        def fused(x, res):
            scale, shift = fold_groupnorm_affine(x, gamma, beta, GROUPS)
            return fused_norm_silu_conv3d(
                x, w, scale, shift, bias=bias, residual=res
            )

        # correctness cross-check once per shape
        a = jax.jit(xla_chain)(x, res).astype(jnp.float32)
        bval = jax.jit(fused)(x, res).astype(jnp.float32)
        maxdiff = float(jnp.max(jnp.abs(a - bval)))

        for name, fn in (("xla_chain", xla_chain), ("fused", fused)):
            if selected and name not in selected:
                continue

            def make(n, fn=fn):
                # x/res enter as jit ARGUMENTS — closing over 128^3
                # tensors embeds them as HLO constants and blows the
                # remote-compile request size limit
                @jax.jit
                def run(x, res):
                    def body(carry, _):
                        y = fn(carry, res)
                        return y, None
                    y, _ = jax.lax.scan(body, x, None, length=n)
                    return jnp.sum(y.astype(jnp.float32))
                return lambda: run(x, res)

            ms = _timeit(make)
            rec = {"shape": label, "variant": name, "ms": round(ms, 3),
                   "maxdiff_vs_xla": round(maxdiff, 5)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results_fused_conv.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
