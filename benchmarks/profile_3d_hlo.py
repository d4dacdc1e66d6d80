"""HLO-correlated profile of 3D 128^3 DDIM sampling.

The category profile (results_3d_profile.json) buckets 43% of device time
as "fusions" — but XLA:TPU output-fuses convolutions INTO loop fusions,
so that bucket may be mostly conv work. This tool keeps the full
`%fusion.N` names from the trace and cross-references each against the
compiled module's HLO text: does the fused computation contain a
convolution / dot, and at what output shape? That turns the opaque
fusion bucket into an actionable per-op table.

Writes benchmarks/results_3d_hlo_profile.json.
"""
from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from generativemodels_tpu.inferers import DiffusionInferer
from generativemodels_tpu.networks.nets import DiffusionModelUNet
from generativemodels_tpu.networks.schedulers import DDIMScheduler

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import xplane_summary

SIZE = 128
STEPS = 50


def top_ops_full(path: str, top: int = 40):
    """Top ops by duration with UN-collapsed names (keeps .N suffixes)."""
    buf = memoryview(open(path, "rb").read())
    ops: collections.Counter = collections.Counter()
    total = 0
    for field, _, val in xplane_summary._fields(buf):
        if field != 1:
            continue
        pname, lines, event_meta = xplane_summary.parse_plane(val)
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for line_buf in lines:
            lname, events = xplane_summary.parse_line(line_buf)
            if lname != "XLA Ops":
                continue
            for ev in events:
                mid, dur, off = xplane_summary.parse_event(ev)
                name = event_meta.get(mid, f"meta:{mid}")
                ops[name] += dur
                total += dur
    return ops.most_common(top), total


def annotate(hlo: str, opname: str) -> dict:
    """Find `%opname = shape fusion(...), calls=%comp` and summarise the
    called computation's contents."""
    name = opname.lstrip("%")
    m = re.search(rf"^.*%{re.escape(name)}\s*=\s*([^\n]*)$", hlo, re.M)
    if not m:
        return {"found": False}
    rhs = m.group(1)
    # op kind = the identifier before the operand list "(%..." — this also
    # works for tuple-shaped (multi-output) fusions whose shape itself
    # contains parens (layout annotations like T(8,128))
    km = re.search(r"([\w-]+)\(%", rhs) or re.search(r"\s([\w-]+)\(", rhs)
    if not km:
        return {"found": False}
    kind = km.group(1)
    shape = rhs[: km.start()].strip()
    info = {"found": True, "shape": shape[:120], "op": kind}
    cm = re.search(r"calls=%?([\w.-]+)", rhs)
    if cm:
        comp = cm.group(1)
        bm = re.search(
            rf"%?{re.escape(comp)}[^\n{{]*{{(.*?)\n}}", hlo, re.S
        )
        if bm:
            body = bm.group(1)
            kinds = collections.Counter(
                mm.group(1) for mm in re.finditer(r"=\s+[^\s]+\s+([\w-]+)\(", body)
            )
            info["body_ops"] = dict(kinds.most_common(8))
            info["has_conv"] = "convolution" in kinds
            info["has_dot"] = "dot" in kinds
    return info


def main() -> None:
    model = DiffusionModelUNet(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_blocks=1,
        num_channels=(32, 64, 128), attention_levels=(False, False, True),
        num_head_channels=64, norm_num_groups=32, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 1, SIZE, SIZE, SIZE))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32)
    )
    scheduler = DDIMScheduler(num_train_timesteps=1000)
    scheduler.set_timesteps(STEPS)
    inferer = DiffusionInferer(scheduler)
    fn = lambda xx, t, context=None: model.apply(variables, xx, t)
    sample = jax.jit(lambda noise, key: inferer.sample(noise, fn, key=key))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    img = sample(noise, jax.random.PRNGKey(2))
    float(jnp.sum(img))

    compiled = sample.lower(noise, jax.random.PRNGKey(2)).compile()
    hlo = compiled.as_text()

    trace_dir = "/tmp/xprof_3d_hlo"
    with jax.profiler.trace(trace_dir):
        img = sample(noise, jax.random.PRNGKey(3))
        float(jnp.sum(img))

    path = max(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime,
    )
    ops, total = top_ops_full(path)
    # exclude the %while scan wrapper from the denominator (it spans the
    # whole loop and double-counts every inner op)
    inner_total = sum(d for n, d in ops if not n.startswith("%while")) or 1

    rows = []
    for name, dur in ops:
        if name.startswith("%while"):
            continue
        info = annotate(hlo, name.split(" ")[0])
        rows.append({
            "op": name,
            "pct_of_inner": round(dur / inner_total * 100, 2),
            **info,
        })
    result = {"rows": rows[:30], "inner_total_ms": round(inner_total / 1e9, 1)}
    with open(os.path.join(os.path.dirname(__file__), "results_3d_hlo_profile.json"), "w") as f:
        json.dump(result, f, indent=1)
    for r in rows[:25]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
