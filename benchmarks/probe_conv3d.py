"""Probe: is XLA's native 3D convolution the bottleneck at UNet shapes?

The 3D 128^3 DDIM profile shows ~8.7% of bf16 peak during sampling while
the GroupNorm-removal probe (probe_groupnorm_cost.py) recovered only 6.5%
— so the time is in the convolution lowering itself. This times, per
flagship UNet level shape:
  a) native lax.conv_general_dilated 3x3x3 (channels-last), vs
  b) the same conv decomposed into 3 batched 2D 3x3 convs over
     depth-shifted slices (depth folded into batch), which XLA lowers to
     its far more mature 2D conv path.
Equal math (same result up to fp reassociation); prints per-variant ms.
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

# (label, D=H=W, C_in, C_out)  — 3D UNet levels from bench_3d_ddim config
SHAPES = [
    ("lvl0_128_c32", 128, 32, 32),
    ("lvl1_64_c64", 64, 64, 64),
    ("lvl2_32_c128", 32, 128, 128),
]

N_SHORT, N_LONG = 4, 16


def conv3d_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_via_2d(x, w):
    """sum_dz conv2d(x[:, d+dz], w[dz]) with depth folded into batch."""
    b, d, h, wd, cin = x.shape
    cout = w.shape[-1]
    xb = x.reshape(b * d, h, wd, cin)

    def conv2d(xs, w2):
        return jax.lax.conv_general_dilated(
            xs, w2, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # dz = -1, 0, +1 relative depth taps; shift along depth with zero pad
    out = conv2d(xb, w[1]).reshape(b, d, h, wd, cout)
    xm = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    out += conv2d(xm.reshape(b * d, h, wd, cin), w[2]).reshape(b, d, h, wd, cout)
    xp = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    out += conv2d(xp.reshape(b * d, h, wd, cin), w[0]).reshape(b, d, h, wd, cout)
    return out


def conv3d_wide_n(x, w):
    """One conv2d with the 3 depth taps stacked on N, then shifted sums.

    The via-2d variant runs three N=Cout matmuls (25% MXU N-fill at
    Cout=32); stacking taps gives one N=3*Cout conv (75% fill) and the
    depth combination becomes a cheap shifted add over the output.
    """
    b, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    xb = x.reshape(b * d, h, wd, cin)
    wn = jnp.concatenate([w[t] for t in range(kd)], axis=-1)  # (kh,kw,cin,kd*cout)
    z = jax.lax.conv_general_dilated(
        xb, wn, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).reshape(b, d, h, wd, kd, cout)
    # y[:, do] = sum_t z[:, do + t - pd, ..., t] with zero outside range
    pd = kd // 2
    y = z[:, :, :, :, pd]
    for t in range(kd):
        if t == pd:
            continue
        off = t - pd
        if off < 0:
            y = y.at[:, -off:].add(z[:, :off, :, :, t])
        else:
            y = y.at[:, :-off].add(z[:, off:, :, :, t])
    return y


def conv3d_input_fold(x, w):
    """One conv2d with the 3 depth taps concatenated on the *input* channel.

    Dual of wide_n: instead of widening N (which tripled the output
    traffic and lost 3.7x), widen K. The depth-shifted inputs concat to
    (b*d, h, w, kd*cin): contraction 9*cin -> 27*cin (full MXU K-fill at
    cin=32), lane fill 32/128 -> 96/128 on the input loads, and the
    output is written once with no partial-sum adds. Costs one extra
    materialisation of the 3x-wide input (which XLA can fuse with the
    producing elementwise op).
    """
    b, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    pad_hi = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    pad_lo = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    # output[d] = w[0]*x[d-1] + w[1]*x[d] + w[2]*x[d+1]
    xcat = jnp.concatenate([pad_lo, x, pad_hi], axis=-1)
    wcat = jnp.concatenate([w[0], w[1], w[2]], axis=2)  # (kh,kw,kd*cin,cout)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * d, h, wd, kd * cin), wcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, d, h, wd, cout)


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
    variants = {
        "native3d": conv3d_native,
        "via2d": conv3d_via_2d,
        "wide_n": conv3d_wide_n,
        "input_fold": conv3d_input_fold,
    }
    selected = sys.argv[1:] or list(variants)
    results = []
    for label, size, cin, cout in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, size, cin), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout), jnp.bfloat16) * 0.05

        for name in selected:
            fn = variants[name]
            def make(n, fn=fn):
                @jax.jit
                def run():
                    def body(c, _):
                        return fn(c, w) * 0.5, None
                    y, _ = jax.lax.scan(body, x, None, length=n)
                    return jnp.sum(y.astype(jnp.float32))
                return run

            ms = _timeit(make)
            flops = 2 * size**3 * 27 * cin * cout
            tf = flops / (ms / 1e3) / 1e12
            rec = {"shape": label, "variant": name, "ms": round(ms, 3),
                   "tflops": round(tf, 1), "pct_peak": round(tf / 197 * 100, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # numerical parity check on the smallest shape
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 32), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 32, 32), jnp.bfloat16) * 0.05
    a = conv3d_native(x, w).astype(jnp.float32)
    b = conv3d_via_2d(x, w).astype(jnp.float32)
    c = conv3d_wide_n(x, w).astype(jnp.float32)
    e = conv3d_input_fold(x, w).astype(jnp.float32)
    print("max_abs_diff via2d:", float(jnp.max(jnp.abs(a - b))))
    print("max_abs_diff wide_n:", float(jnp.max(jnp.abs(a - c))))
    print("max_abs_diff input_fold:", float(jnp.max(jnp.abs(a - e))))

    out = os.path.join(os.path.dirname(__file__), "results_conv3d_probe.json")
    if len(selected) == len(variants):
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    else:  # partial run: merge into existing records by (shape, variant)
        try:
            old = {(r["shape"], r["variant"]): r for r in json.load(open(out))}
        except Exception:
            old = {}
        for r in results:
            old[(r["shape"], r["variant"])] = r
        with open(out, "w") as f:
            json.dump(list(old.values()), f, indent=1)


if __name__ == "__main__":
    main()
