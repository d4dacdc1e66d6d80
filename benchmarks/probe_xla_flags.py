"""Probe XLA:TPU flags against the 3D 128^3 DDIM-50 headline bench.

Runs benchmarks/bench_3d_ddim.py in a fresh subprocess per flag set
(XLA flags are process-global) and records samples/min. Candidate flags
target the profile's known leftovers: fusion scheduling, scoped-VMEM
headroom for bigger fusions, and latency-hiding scheduler aggressiveness.

Usage: python benchmarks/probe_xla_flags.py [--quick]
Writes benchmarks/results_xla_flags.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "bench_3d_ddim.py")

FLAG_SETS = {
    "baseline": "",
    # more scoped VMEM lets the fusion emitter keep bigger tiles resident
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
}
# each set runs in its own subprocess, so an unknown-flag abort is
# recorded as that row's error without killing the probe


def main() -> None:
    results = []
    sets = FLAG_SETS
    if "--quick" in sys.argv:
        sets = {k: sets[k] for k in ("baseline", "vmem_128m")}
    for name, flags in sets.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, BENCH], env=env, capture_output=True,
                text=True, timeout=2400,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            entry = json.loads(line[-1]) if line else {"error": out.stderr[-400:]}
        except subprocess.TimeoutExpired:
            entry = {"error": "timeout"}
        entry = {"flags": name, "args": flags,
                 "value": entry.get("value"), "error": entry.get("error")}
        print(json.dumps(entry))
        results.append(entry)

    with open(os.path.join(HERE, "results_xla_flags.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
