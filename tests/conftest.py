"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; tests exercise sharding and
numerics on `--xla_force_host_platform_device_count=8` CPU devices, mirroring
how the reference tests run on CPU (reference tests/utils.py:459-462 uses a
gloo fallback for the same reason).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
