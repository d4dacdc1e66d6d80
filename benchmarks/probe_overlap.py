"""Probe: can the flash kernel overlap MXU matmuls with VPU softmax work?

The post-no_max HLO profile (results_3d_hlo_profile.json + memory) puts the
32k/d64 flash forward at ~6.05 ms/call vs an MXU-ideal ~2.8 ms — consistent
with the per-tile MXU(QK) -> VPU(clamp/exp2/cast) -> MXU(PV) chain executing
*additively*. This probe isolates the two phases and tests restructurings
that hand Mosaic's scheduler independent MXU/VPU chains to interleave:

  full      - the shipped no_max+fold_l body (prescaled q, exp2, clamp 80)
  mxu_only  - QK (preferred bf16 out) -> PV, no VPU score ops: MXU floor
  ilv2      - 2 k-halves per grid step, program order s1,s2,p1,pv1,p2,pv2:
              p2's VPU work can in principle ride under pv1's MXU stream
  ilv4      - same with 4 k-quarters (more interleave slack, more VMEM)
  q2        - 2 q-tiles per grid step sharing ONE k/v tile: two fully
              independent MXU->VPU->MXU chains for the scheduler AND half
              the K/V DMA traffic per q-row
  bf16dom   - QK emits bf16 scores; clamp+exp2 run on packed bf16 vectors
              (2 elems/lane) - tests whether VPU packed ops double through-
              put at a ~0.4% relative weight-precision cost (NOTE: CPU
              numerics already showed bf16 score rounding is inadmissible
              for shipping - speed datapoint only)
  ilv2_bf16 - both

Numerics are checked against a full-softmax einsum on a 2k slice (except
mxu_only, which is intentionally garbage). Usage: python probe_overlap.py
[variant ...]; writes benchmarks/results_overlap.json.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, SEQ, D = 2, 32768, 64
BQ, BK = 1024, 1024
N_SHORT, N_LONG = 2, 6
LOG2E = 1.4426950408889634


def _score_probs(s, bf16_dom):
    """clamp + exp2 on the score tile; packed bf16 domain optional."""
    if bf16_dom:
        return jnp.exp2(jnp.minimum(s, jnp.bfloat16(80.0)))
    return jnp.exp2(jnp.minimum(s, 80.0)).astype(jnp.bfloat16)


def _kernel_q2(q_ref, k_ref, v_ref, o_ref, acc_ref, *, variant):
    """Two q-tiles per grid step over one shared k/v tile."""
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0]
    v = v_ref[0]
    vl = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
    qs = [q_ref[0, h * BQ:(h + 1) * BQ] for h in range(2)]
    ss = [
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        for q in qs
    ]
    for h in range(2):
        p = _score_probs(ss[h], False)
        acc_ref[h * BQ:(h + 1) * BQ] = acc_ref[h * BQ:(h + 1) * BQ] + (
            jax.lax.dot_general(
                p, vl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )

    @pl.when(kj == num_k - 1)
    def _():
        d = o_ref.shape[-1]
        l_safe = jnp.maximum(acc_ref[:, d:], 1e-30)
        o_ref[0] = (acc_ref[:, :d] / l_safe).astype(o_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, variant):
    kj = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # bf16, prescaled by scale*log2e outside
    halves = {"ilv2": 2, "ilv2_bf16": 2, "ilv4": 4}.get(variant, 1)
    bk = k_ref.shape[1] // halves
    bf16_dom = variant in ("bf16dom", "ilv2_bf16")
    # Mosaic requires 32-bit matmul accumulators; bf16-domain variants cast
    # the f32 scores down afterwards (one VPU pass — counted against them).
    ss = []
    for h in range(halves):
        k = k_ref[0, h * bk:(h + 1) * bk]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if bf16_dom or variant == "mxu_only":
            s = s.astype(jnp.bfloat16)
        ss.append(s)
    for h in range(halves):
        v = v_ref[0, h * bk:(h + 1) * bk]
        vl = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        p = ss[h] if variant == "mxu_only" else _score_probs(ss[h], bf16_dom)
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            p, vl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kj == num_k - 1)
    def _():
        d = o_ref.shape[-1]
        l_safe = jnp.maximum(acc_ref[:, d:], 1e-30)
        o_ref[0] = (acc_ref[:, :d] / l_safe).astype(o_ref.dtype)


def flash_var(q, k, v, *, scale, variant):
    bh, sq, d = q.shape
    q = q * jnp.asarray(scale * LOG2E, q.dtype)
    bk_grid = BK * {"ilv2": 2, "ilv2_bf16": 2, "ilv4": 4}.get(variant, 1)
    bq_grid = BQ * (2 if variant == "q2" else 1)
    grid = (bh, sq // bq_grid, k.shape[1] // bk_grid)
    out = pl.pallas_call(
        functools.partial(_kernel_q2 if variant == "q2" else _kernel, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq_grid, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk_grid, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk_grid, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq_grid, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq_grid, d + 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(q, k, v)
    return out


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
    scale = 1.0 / D**0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (BH, SEQ, D), jnp.bfloat16)
    k = jax.random.normal(kk, (BH, SEQ, D), jnp.bfloat16)
    v = jax.random.normal(kv, (BH, SEQ, D), jnp.bfloat16)

    sl = 4096  # big enough for the widest bk_grid (ilv4: 4096)
    qs, ks, vs = q[:, :sl], k[:, :sl], v[:, :sl]
    sref = jnp.einsum("bqd,bkd->bqk", qs.astype(jnp.float32), ks.astype(jnp.float32)) * scale
    ref = jnp.einsum(
        "bqk,bkd->bqd", jax.nn.softmax(sref, axis=-1), vs.astype(jnp.float32)
    )

    variants = ["full", "mxu_only", "ilv2", "ilv4", "q2", "bf16dom", "ilv2_bf16"]
    selected = sys.argv[1:] or variants
    results = []
    for name in selected:
        fn = functools.partial(flash_var, scale=scale, variant=name)
        if name == "mxu_only":
            err = None
        else:
            small = jax.jit(lambda a, b, c: fn(a, b, c))(qs, ks, vs).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(small - ref)))

        def make(n, fn=fn):
            @jax.jit
            def run(q, k, v):
                def body(c, _):
                    return fn(c, k, v).astype(q.dtype), None
                y, _ = jax.lax.scan(body, q, None, length=n)
                return jnp.sum(y.astype(jnp.float32))
            return lambda: run(q, k, v)

        ms = _timeit(make)
        entry = {"variant": name, "ms": round(ms, 3), "maxdiff_vs_einsum": err}
        print(json.dumps(entry))
        results.append(entry)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_overlap.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
