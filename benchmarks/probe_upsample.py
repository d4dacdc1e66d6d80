"""Probe: faster 3D nearest-neighbour upsampling lowerings.

The HLO profile shows the up-path broadcast (64³ -> 128³, C=64) at 2.7%
of inner time — ~1.65 ms for a 134 MB write, ~9x its bandwidth cost,
because the single interleaved broadcast produces a strided T(2,128)
store pattern. Variants:

  broadcast - current upsample_nearest (one broadcast + reshape)
  per_axis  - three sequential axis repeats (denser stores per pass)
  repeat    - jnp.repeat per axis
  dw_tconv  - depthwise 2x2x2 stride-2 transposed conv with ones kernel
              (exact nearest upsample through the conv path)

Writes results_upsample.json.
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
from jax import lax

from generativemodels_tpu.networks.blocks.convolutions import upsample_nearest

N_SHORT, N_LONG = 4, 16
SHAPE = (1, 64, 64, 64, 64)  # up-path lvl1 -> lvl0 feature map


def per_axis(x, scale=2):
    for axis in range(1, 4):
        s = x.shape
        x = jnp.broadcast_to(
            jnp.expand_dims(x, axis + 1),
            s[: axis + 1] + (scale,) + s[axis + 1 :],
        ).reshape(s[:axis] + (s[axis] * scale,) + s[axis + 1 :])
    return x


def repeat(x, scale=2):
    for axis in range(1, 4):
        x = jnp.repeat(x, scale, axis=axis)
    return x


def _dw_tconv_grouped(x, scale=2):
    c = x.shape[-1]
    k = jnp.ones((scale, scale, scale, 1, c), x.dtype)
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding=[(scale - 1, scale - 1)] * 3,
        lhs_dilation=(scale,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
    )


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
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.bfloat16)
    variants = {
        "broadcast": lambda v: upsample_nearest(v, 2),
        "per_axis": per_axis,
        "repeat": repeat,
        "dw_tconv": _dw_tconv_grouped,
    }
    ref = jax.jit(lambda v: upsample_nearest(v, 2))(x)
    results = []
    for name, fn in variants.items():
        got = jax.jit(fn)(x)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))

        def make(n, fn=fn):
            @jax.jit
            def run(x):
                def body(c, _):
                    # fold back down so the carry keeps the input shape
                    return fn(c)[:, ::2, ::2, ::2], None
                y, _ = lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32))
            return lambda: run(x)

        ms = _timeit(make)
        rec = {"variant": name, "ms": round(ms, 3), "maxdiff": err}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results_upsample.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
