"""Broadcasting helpers shared by schedulers and inferers.

Reference parity: generative/utils/misc.py:19-26 (unsqueeze_right/left).
"""
from __future__ import annotations

import jax.numpy as jnp


def unsqueeze_right(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append size-1 axes to `x` until it has `ndim` dimensions.

    Used to broadcast per-batch scalar coefficients (e.g. sqrt(alpha_bar_t))
    against image tensors of shape (B, C, *spatial).
    """
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def unsqueeze_left(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Prepend size-1 axes to `x` until it has `ndim` dimensions."""
    return x.reshape((1,) * (ndim - x.ndim) + x.shape)
