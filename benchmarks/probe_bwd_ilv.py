"""Backward-tile interleave sweep on-chip (round 4).

The forward kernel's sub-tile interleave (GMTPU_FLASH_ILV, ilv=(2,2) at
the long-narrow-head shapes) bought +5.2% by issuing all score matmuls
before the probs/PV VPU chains. This probes the same trick applied to
the SPLIT backward kernels (GMTPU_FLASH_BWD_ILV): each sub-chunk's two
independent MXU matmuls (s = q@k^T, dp = do@v^T) are issued ahead of the
exp2/ds VPU chains, then the dq/dk/dv output matmuls follow.

Measurement: the scan-based long/short differential (see
probe_fused_bwd.py for the tunnel-measurement hazards this sidesteps).
fwd+bwd is timed; the fwd kernel is identical across variants, so any
delta is the backward.

Writes benchmarks/results_bwd_ilv.json.
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

SHAPES = [
    ("mid_4k", 4, 4096, 64),
    ("2d_lvl1", 128, 1024, 256),
    ("3d_32k", 2, 32768, 64),
]

ILVS = ["1,1", "1,2", "2,2", "1,4"]

N_SHORT, N_LONG = 4, 20


def _timeit(make_scanned, trials: int = 5) -> float:
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


def bench_one(bh, s, d, bilv: str) -> float:
    os.environ["GMTPU_FLASH_BWD_ILV"] = bilv
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, s, d), jnp.bfloat16)
    block_q, block_k, _ = _pick_blocks(s, d)
    scale = 1.0 / d**0.5

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, scale=scale, block_q=block_q, block_k=block_k
            ).astype(jnp.float32)
            ** 2
        )

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def make_scanned(n, _q=q, _k=k, _v=v):
        def body(c, _):
            dq, dk, dv = grad(c, _k, _v)
            # thread dq back into q: inputs vary every step (dedup-proof)
            return (c + 1e-3 * dq).astype(c.dtype), None

        return jax.jit(
            lambda: jnp.sum(
                jax.lax.scan(body, _q, None, length=n)[0].astype(jnp.float32)
            )
        )

    return _timeit(make_scanned)


def main():
    rows = []
    for name, bh, s, d in SHAPES:
        base_ms = None
        for bilv in ILVS:
            # the remote compile service occasionally drops a response
            # mid-body; one retry is enough in practice
            try:
                ms = bench_one(bh, s, d, bilv)
            except Exception as e:  # noqa: BLE001
                print(f"retrying {name} {bilv} after: {e}", flush=True)
                time.sleep(5)
                ms = bench_one(bh, s, d, bilv)
            if bilv == "1,1":
                base_ms = ms
            row = {
                "shape": name,
                "bh": bh,
                "seq": s,
                "head_dim": d,
                "bwd_ilv": bilv,
                "fwd_bwd_ms": round(ms, 3),
                "speedup_vs_1_1": round(base_ms / ms, 3),
            }
            rows.append(row)
            print(row, flush=True)
            out = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "results_bwd_ilv.json",
            )
            with open(out, "w") as f:
                json.dump({"rows": rows, "backend": jax.default_backend()}, f, indent=1)


if __name__ == "__main__":
    main()
