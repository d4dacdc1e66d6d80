"""Probe: do int8 convolutions beat bf16 at the 3D UNet level shapes?

v5e lists 394 TOPS int8 vs 197 TFLOP/s bf16 (2x). If XLA:TPU lowers
int8 2D convs at the doubled MXU rate, the decomposed 3D convs (~20% of
the 128^3 DDIM sample) could halve — at a quantization-accuracy cost
that would need per-channel scales and careful validation before any
production use. This probe measures only the raw kernel-rate question:
same depth-tap decomposition, int8 operands + int32 accumulation +
rescale, vs the production bf16 path.

Writes results_int8_conv.json.
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

SHAPES = [
    ("lvl0_128_c32", 128, 32, 32),
    ("lvl1_64_c64", 64, 64, 64),
]
N_SHORT, N_LONG = 4, 16


def conv2d(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def via2d(x, w, out_dtype):
    """Depth-tap decomposition with output-side shifts (stride 1, k=3)."""
    b, d, h, wd, cin = x.shape
    cout = w.shape[-1]
    xb = x.reshape(b * d, h, wd, cin)
    y = None
    for t in range(3):
        z = conv2d(xb, w[t], out_dtype).reshape(b, d, h, wd, cout)
        off = t - 1
        do_start, do_end = max(0, -off), min(d, d - off)
        z = z[:, do_start + off : do_end + off]
        lo, hi = do_start, d - do_end
        if lo or hi:
            z = jnp.pad(z, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
        y = z if y is None else y + z
    return y


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
    results = []
    for label, size, cin, cout in SHAPES:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        xb = jax.random.normal(kx, (1, size, size, size, cin), jnp.bfloat16)
        wb = jax.random.normal(kw, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.05
        # symmetric per-tensor int8 quantization (rate probe only)
        xs = 127.0 / 4.0
        ws = 127.0 / 0.2
        xi = jnp.clip(jnp.round(xb.astype(jnp.float32) * xs), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(wb.astype(jnp.float32) * ws), -127, 127).astype(jnp.int8)

        # the conv output feeds the next carry so the loop body cannot be
        # hoisted out of the scan as loop-invariant (the int8 variant
        # includes the requantize step a quantized inference path pays)
        variants = {
            "bf16": (xb, wb, lambda c, w: via2d(c, w, jnp.float32).astype(jnp.bfloat16)),
            "int8": (xi, wi, lambda c, w: jnp.clip(
                jnp.round(via2d(c, w, jnp.int32).astype(jnp.float32) / ws),
                -127, 127).astype(jnp.int8)),
        }
        for name, (x0, w0, fn) in variants.items():
            def make(n, x0=x0, w0=w0, fn=fn):
                @jax.jit
                def run(x, w):
                    def body(c, _):
                        return fn(c, w), None
                    y, _ = lax.scan(body, x, None, length=n)
                    return jnp.sum(y.astype(jnp.float32))
                return lambda: run(x0, w0)

            try:
                ms = _timeit(make)
            except Exception as e:  # int8 conv may be unsupported
                print(f"{label} {name}: FAILED {type(e).__name__}: {e}", flush=True)
                results.append({"shape": label, "variant": name, "error": repr(e)[:200]})
                continue
            rec = {"shape": label, "variant": name, "ms": round(ms, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results_int8_conv.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
