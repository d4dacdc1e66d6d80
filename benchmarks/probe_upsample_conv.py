"""Probe: fused nearest-upsample+conv3^3 for the UNet decoder upsamplers.

The 3D HLO profile (results_3d_hlo_profile.json) shows the decoder's
upsample path paying ~5.5% of inner sample time: a 2.7% materialised
256 MB broadcast (the nearest upsample) plus a full 27-tap conv over the
upsampled volume. Algebraically `conv3x3x3_pad1(upsample_nearest_2x(x))`
is computable from the LOW-RES x directly; two formulations:

  B. parity-8: for each output parity (a,b,c) in {0,1}^3 the effective
     kernel collapses to 2x2x2 (per axis: even taps [w0, w1+w2] at
     offsets (-1,0); odd taps [w0+w1, w2] at (0,+1)) -> 8/27 of the
     FLOPs, 16 small 2D convs + a 3-axis interleave.
  E. tconv4: the same map is exactly a transposed conv with stride 2,
     K=4, P=1 and per-axis kernel transform
     T = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] (W4 = T (x) T (x) T . w).
     Lowered like ConvTransposeND's probe winner: per-depth-tap 2D
     lax.conv_transpose (XLA's lhs-dilated conv, MXU-efficient) +
     depth-phase interleave only.

Measured against A (current: upsample_nearest + depth-tap decomposed
conv). Writes benchmarks/results_upsample_conv.json.
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

from generativemodels_tpu.networks.blocks.convolutions import (
    _conv3d_via_2d,
    upsample_nearest,
)

N_SHORT, N_LONG = 4, 16


def current_up_conv(x, w):
    return _conv3d_via_2d(upsample_nearest(x), w, (1, 1, 1), (1, 1, 1))


def parity_up_conv(x, w):
    """conv3x3x3(upsample2x(x)) from low-res x: 8 parity convs + interleave."""
    B, D, H, W, C = x.shape
    cout = w.shape[-1]
    wf = w.astype(jnp.float32)
    M = [
        jnp.array([[1.0, 0, 0], [0, 1, 1]], jnp.float32),  # even: offsets (-1, 0)
        jnp.array([[1.0, 1, 0], [0, 0, 1]], jnp.float32),  # odd: offsets (0, +1)
    ]
    dn2 = lax.conv_dimension_numbers(
        (B * D, H, W, C), (2, 2, C, cout), ("NHWC", "HWIO", "NHWC")
    )
    xb = x.reshape(B * D, H, W, C)
    outs = []
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                K = jnp.einsum("iu,jv,kw,uvwco->ijkco", M[a], M[b], M[c], wf)
                K = K.astype(w.dtype)
                padhw = [(1, 0) if b == 0 else (0, 1), (1, 0) if c == 0 else (0, 1)]
                y = None
                for t in (0, 1):
                    z = lax.conv_general_dilated(
                        xb, K[t], (1, 1), padhw, dimension_numbers=dn2
                    ).reshape(B, D, H, W, cout)
                    off = t - 1 + a  # out[i] += z[i + off]
                    lo = max(0, -off)
                    hiv = min(D, D - off)
                    zz = z[:, lo + off : hiv + off]
                    if lo or (D - hiv):
                        zz = jnp.pad(
                            zz, ((0, 0), (lo, D - hiv), (0, 0), (0, 0), (0, 0))
                        )
                    y = zz if y is None else y + zz
                outs.append(y)
    o = jnp.stack(outs, axis=-2).reshape(B, D, H, W, 2, 2, 2, cout)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return o.reshape(B, 2 * D, 2 * H, 2 * W, cout)


def _tconv3d_via_2d(x, w, K, S, P):
    """Stride-S K^3 transposed conv as per-tap 2D tconvs + depth phases."""
    b, d_in, h, wd, cin = x.shape
    cout = w.shape[-1]
    d_out = (d_in - 1) * S - 2 * P + K
    pad2 = [(K - 1 - P, K - 1 - P)] * 2
    dn = lax.conv_dimension_numbers(
        (b * d_in, h, wd, cin), (K, K, cin, cout), ("NHWC", "HWIO", "NHWC")
    )
    xb = x.reshape(b * d_in, h, wd, cin)
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
            if (phase + t + P - K + 1) % S != 0:
                continue
            shift = (phase + t + P - K + 1) // S
            n_out = (d_out - phase + S - 1) // S
            z = zs[t]
            lo = max(0, -shift)
            hi = max(0, shift + n_out - d_in)
            zp = jnp.pad(z, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
            sl = zp[:, lo + shift : lo + shift + n_out]
            acc = sl if acc is None else acc + sl
        phases.append(acc)
    y = jnp.stack(phases, axis=2)  # (b, n_out, S, oh, ow, cout)
    return y.reshape(b, -1, oh, ow, cout)[:, :d_out]


_T4 = jnp.array(
    [[1.0, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], jnp.float32
)


def tconv4_up_conv(x, w):
    wf = w.astype(jnp.float32)
    w4 = jnp.einsum("pu,qv,rw,uvwco->pqrco", _T4, _T4, _T4, wf).astype(w.dtype)
    return _tconv3d_via_2d(x, w4, K=4, S=2, P=1)


def _timeit(make_scanned, trials: int = 5) -> float:
    short, long_ = make_scanned(N_SHORT), make_scanned(N_LONG)
    float(short())
    float(long_())
    diffs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(short())
        t1 = time.perf_counter()
        float(long_())
        t2 = time.perf_counter()
        diffs.append(max((t2 - t1) - (t1 - t0), 1e-9) / (N_LONG - N_SHORT) * 1e3)
    diffs.sort()
    return diffs[len(diffs) // 2]


def main():
    results = []
    variants = (
        ("current", current_up_conv),
        ("parity8", parity_up_conv),
        ("tconv4", tconv4_up_conv),
    )
    for label, D, C in [("lvl0_up", 64, 64), ("lvl1_up", 32, 128)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, D, D, D, C), jnp.bfloat16)
        w = (
            jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C), jnp.float32)
            * 0.05
        ).astype(jnp.bfloat16)

        ref = jax.jit(current_up_conv)(x, w)
        row = {"shape": label, "in": list(x.shape)}
        for name, fn in variants:
            if name != "current":
                out = jax.jit(fn)(x, w)
                row[f"maxdiff_{name}"] = float(
                    jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32)))
                )

            def make(n, fn=fn):
                @jax.jit
                def run():
                    def body(c, _):
                        s = jnp.sum(fn(c, w).astype(jnp.float32))
                        return c + (s * 1e-20).astype(c.dtype), s

                    _, ss = jax.lax.scan(body, x, None, length=n)
                    return jnp.sum(ss)

                return run

            row[f"ms_{name}"] = round(_timeit(make), 3)
        for name, _ in variants[1:]:
            row[f"speedup_{name}"] = round(row["ms_current"] / row[f"ms_{name}"], 3)
        print(json.dumps(row))
        results.append(row)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_upsample_conv.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
