"""On-chip smoke runs of the 3D tutorial recipes (VERDICT round-2 item 2).

Runs each 3D recipe main() briefly at on-chip-feasible shapes and records
wall-clock + configuration to results_3d_recipes_smoke.json. These are
smoke numbers (compile + a few steps), not throughput benchmarks — the
tuned 3D throughput lives in bench_3d_train.py / bench_3d_ddim.py.
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


def run(label, fn, argv):
    t0 = time.time()
    fn(argv)
    return {"recipe": label, "argv": argv, "wall_s": round(time.time() - t0, 1),
            "backend": jax.default_backend()}


def main() -> None:
    from generativemodels_tpu.recipes import train_3d_ddpm, train_3d_ldm, train_vqgan

    results = [
        run("train_3d_ddpm", train_3d_ddpm.main, [
            "--steps", "20", "--batch", "1", "--size", "64",
            "--channels", "32", "64", "--head-channels", "64",
            "--sample", "--sample-steps", "10",
        ]),
        run("train_3d_ldm", train_3d_ldm.main, [
            "--stage1-steps", "10", "--stage2-steps", "10",
            "--warmup-steps", "4", "--batch", "1", "--size", "32", "--sample",
            "--sample-steps", "10",
        ]),
        run("train_vqgan_3d", lambda argv: train_vqgan.main(argv), [
            "--steps", "10", "--warmup-steps", "10", "--batch", "1",
            "--size", "32", "--spatial-dims", "3", "--channels", "32", "64",
            "--adv-weight", "0",
        ]),
    ]
    out = os.path.join(os.path.dirname(__file__), "results_3d_recipes_smoke.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
