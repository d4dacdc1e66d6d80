"""AOT export of jitted functions for deployment/serving.

The framework analogue of the reference's TorchScript export surface
(tests/utils.py:720-744 script-save tests): a jitted sampler or forward
step is lowered, serialised with `jax.export`, and can be reloaded and
invoked in a serving process without the model-building python code.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def export_fn(fn: Callable, *example_args, platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialise a jittable function specialised to the example arg shapes.

    Args:
        fn: pure function of arrays (params already closed over).
        example_args: abstract or concrete arrays fixing shapes/dtypes.
        platforms: lowering platforms (default: current backend).

    Returns:
        serialised bytes (persist to disk; reload with `load_fn`).
    """
    from jax import export as jax_export

    args = tuple(
        jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)) for a in example_args
    )
    exported = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*args)
    return exported.serialize()


def load_fn(blob: bytes) -> Callable:
    """Reload an exported function; returns a callable over device arrays."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return lambda *args: exported.call(*args)


def save_exported(path: str, fn: Callable, *example_args, **kwargs) -> None:
    with open(path, "wb") as f:
        f.write(export_fn(fn, *example_args, **kwargs))


def load_exported(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_fn(f.read())
