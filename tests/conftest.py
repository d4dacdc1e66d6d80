"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; tests exercise sharding and
numerics on `--xla_force_host_platform_device_count=8` CPU devices, mirroring
how the reference tests run on CPU (reference tests/utils.py:459-462 uses a
gloo fallback for the same reason).

Note: the image's sitecustomize imports jax and registers the `axon` TPU
plugin at interpreter startup, so plain env vars are read too late; the
platform must be forced through jax.config instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
