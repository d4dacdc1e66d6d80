"""Multi-process distributed test scaffolding.

TPU-native analogue of the reference's DistCall (tests/utils.py:395-544:
spawn N local processes, set MASTER_ADDR/RANK, init_process_group with
gloo fallback). Here each worker process runs `jax.distributed.initialize`
against a local coordinator on the CPU backend and the test asserts on the
workers' outputs. This validates the true multi-process path (gRPC
coordination + cross-process collectives) that virtual single-process
meshes cannot.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

_WORKER_TEMPLATE = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["GMTPU_COORD"],
    num_processes=int(os.environ["GMTPU_NPROC"]),
    process_id=int(os.environ["GMTPU_RANK"]),
)
{body}
"""


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_distributed(worker_body: str, num_processes: int = 2, timeout: int = 120):
    """Run `worker_body` in N coordinated processes; returns their stdouts.

    The body runs after jax.distributed.initialize; it should print one
    JSON line as its result.
    """
    port = free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["GMTPU_COORD"] = f"127.0.0.1:{port}"
    env_base["GMTPU_NPROC"] = str(num_processes)
    # one CPU device per process
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    script = _WORKER_TEMPLATE.format(body=worker_body)
    procs = []
    for rank in range(num_processes):
        env = dict(env_base)
        env["GMTPU_RANK"] = str(rank)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for rank, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            raise RuntimeError(f"worker {rank} failed:\n{stderr[-2000:]}")
        last = [l for l in stdout.strip().splitlines() if l.strip()][-1]
        outs.append(json.loads(last))
    return outs
