"""Probe: native 3D transposed conv vs depth-phase 2D decomposition.

Companion to probe_conv3d.py for the VQVAE/AEKL 3D decoder path
(reference vqvae.py:173-271 uses ConvTranspose k=4 s=2). A stride-s
transposed conv splits by output-depth phase: output depth `do` receives
input depths di = (do + p - t)/s for kernel taps t with
(do + p - t) % s == 0, so each (phase, tap) pair is one batched 2D
transposed conv and depth phases interleave into the output.
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

# (label, D=H=W in, C_in, C_out) — VQVAE 3D decoder stages (k=4, s=2)
SHAPES = [
    ("dec_32_192to96", 32, 192, 96),
    ("dec_64_96to96", 64, 96, 96),
]
K, S, P = 4, 2, 1  # reference downsample/upsample parameters (vqvae.py:311)

N_SHORT, N_LONG = 4, 16


def tconv3d_native(x, w):
    pad = [(K - 1 - P, K - 1 - P)] * 3
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_transpose(x, w, strides=(S, S, S), padding=pad,
                              dimension_numbers=dn)


def tconv3d_via_2d(x, w):
    b, d_in, h, wd, cin = x.shape
    cout = w.shape[-1]
    d_out = (d_in - 1) * S - 2 * P + K
    pad2 = [(K - 1 - P, K - 1 - P)] * 2
    dn = lax.conv_dimension_numbers(
        (b * d_in, h, wd, cin), (K, K, cin, cout), ("NHWC", "HWIO", "NHWC")
    )
    xb = x.reshape(b * d_in, h, wd, cin)
    # per-tap 2D transposed convs, shared across output phases
    zs = [
        lax.conv_transpose(xb, w[t], strides=(S, S), padding=pad2,
                           dimension_numbers=dn)
        for t in range(K)
    ]
    oh, ow = zs[0].shape[1:3]
    zs = [z.reshape(b, d_in, oh, ow, cout) for z in zs]

    phases = []
    for phase in range(S):
        acc = None
        for t in range(K):
            # lax.conv_transpose does NOT flip the kernel: with
            # pad_lo = K-1-P, output do sums x[di]*w[t] at
            # di = (do + t + P - K + 1) / S (when integral)
            if (phase + t + P - K + 1) % S != 0:
                continue
            shift = (phase + t + P - K + 1) // S
            n_out = (d_out - phase + S - 1) // S  # outputs in this phase
            z = zs[t]
            lo = max(0, -shift)
            hi = max(0, shift + n_out - d_in)
            zp = jnp.pad(z, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
            sl = zp[:, lo + shift : lo + shift + n_out]
            acc = sl if acc is None else acc + sl
        phases.append(acc)
    # interleave phases along depth
    y = jnp.stack(phases, axis=2)  # (b, n_out, S, oh, ow, cout)
    y = y.reshape(b, -1, oh, ow, cout)[:, :d_out]
    return y


def _timeit(make_scanned, trials: int = 5) -> float:
    short, long = make_scanned(N_SHORT), make_scanned(N_LONG)
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
    # parity first, on a small shape
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 6, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, K, K, 8, 8), jnp.float32) * 0.05
    a = tconv3d_native(x, w)
    b = tconv3d_via_2d(x, w)
    assert a.shape == b.shape, (a.shape, b.shape)
    import numpy as np

    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
    print("parity ok", a.shape)

    results = []
    for label, size, cin, cout in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, size, cin), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (K, K, K, cin, cout), jnp.bfloat16) * 0.05
        for name, fn in (("native3d", tconv3d_native), ("via2d", tconv3d_via_2d)):
            def make(n, fn=fn):
                @jax.jit
                def run():
                    def body(c, _):
                        s = jnp.sum(fn(c, w).astype(jnp.float32))
                        # tiny feedback keeps the conv in the serial chain
                        return c + (s * 1e-20).astype(c.dtype), s
                    _, ss = jax.lax.scan(body, x, None, length=n)
                    return jnp.sum(ss)
                return run

            ms = _timeit(make)
            rec = {"shape": label, "variant": name, "ms": round(ms, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    with open(os.path.join(os.path.dirname(__file__), "results_tconv3d_probe.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
