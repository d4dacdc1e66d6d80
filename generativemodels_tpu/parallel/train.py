"""Sharded diffusion training steps (the DDP-tutorial equivalent).

Reference parity: tutorials/generative/distributed_training/
ddpm_training_ddp.py:249-268 (per-rank forward + MSE-on-noise + implicit
NCCL gradient all-reduce). Here the whole step is ONE jitted function with
NamedSharding constraints; XLA emits the gradient reductions over the
mesh's ICI links. Params are donated so optimizer updates reuse buffers.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from .mesh import batch_sharding, replicated, spatial_sharding


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # Exponential moving average of params (None unless the step was built
    # with ema_decay). Sampling from the EMA weights is standard diffusion
    # practice (beyond reference: the torch reference ships no EMA); pass
    # `state.ema_params` wherever you would pass `state.params`.
    ema_params: Any = None


def make_diffusion_train_step(
    model_apply: Callable,
    scheduler,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
    num_train_timesteps: int | None = None,
    prediction_target: str = "epsilon",
    spatial_shard_axis: int | None = None,
    donate: bool = True,
    accumulate_steps: int = 1,
    ema_decay: float | None = None,
):
    """Build a jitted (optionally mesh-sharded) DDPM training step.

    Args:
        model_apply: `(params, x, timesteps) -> prediction`.
        scheduler: Scheduler providing add_noise / get_velocity.
        tx: optax optimizer.
        mesh: if given, constrain batch over the "data" axis (and one
            spatial axis over "space" when `spatial_shard_axis` is set).
        num_train_timesteps: timestep draw range (default scheduler's).
        prediction_target: "epsilon" | "v_prediction" | "sample".
        spatial_shard_axis: index of the spatial axis to shard (e.g. 2).
        accumulate_steps: gradient accumulation. The incoming batch is
            split into this many equal microbatches; grads are averaged
            over a `lax.scan` (activation memory = one microbatch, so
            effective batches can exceed HBM) and applied in ONE
            optimizer update — numerically the full-batch step.
        ema_decay: if set, maintain an exponential moving average of the
            params in `state.ema_params` (init with
            `init_train_state(..., ema=True)`). Effective decay warms up
            as `min(ema_decay, (1+step)/(10+step))` so early steps track
            the fast-moving params instead of the random init.

    Returns:
        `step(state, images, rng) -> (state, loss)`.
    """
    T = num_train_timesteps or scheduler.num_train_timesteps

    def loss_fn(params, images, noise, timesteps):
        noisy = scheduler.add_noise(images, noise, timesteps)
        pred = model_apply(params, noisy, timesteps)
        if prediction_target == "epsilon":
            target = noise
        elif prediction_target == "v_prediction":
            target = scheduler.get_velocity(images, noise, timesteps)
        else:
            target = images
        return jnp.mean((pred - target) ** 2)

    def step(state: TrainState, images, rng):
        sharding = None
        if mesh is not None:
            if spatial_shard_axis is not None:
                sharding = spatial_sharding(
                    mesh, images.ndim, spatial_axis_index=spatial_shard_axis
                )
            else:
                sharding = batch_sharding(mesh, images.ndim)
            images = jax.lax.with_sharding_constraint(images, sharding)

        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, images.shape, dtype=images.dtype)
        timesteps = jax.random.randint(k_t, (images.shape[0],), 0, T)

        if accumulate_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, images, noise, timesteps
            )
        else:
            if images.shape[0] % accumulate_steps:
                raise ValueError(
                    f"batch {images.shape[0]} not divisible by "
                    f"accumulate_steps={accumulate_steps}"
                )
            mb = images.shape[0] // accumulate_steps
            stack = lambda a: a.reshape((accumulate_steps, mb) + a.shape[1:])

            def micro(carry, inp):
                im, no, ts = inp
                if sharding is not None:
                    # the SAME sharding as the full batch: re-constraining
                    # with batch_sharding here would all-gather a
                    # spatially-sharded volume per microbatch
                    im = jax.lax.with_sharding_constraint(im, sharding)
                l, g = jax.value_and_grad(loss_fn)(state.params, im, no, ts)
                acc_l, acc_g = carry
                return (acc_l + l, jax.tree_util.tree_map(jnp.add, acc_g, g)), None

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
            )
            (loss, grads), _ = jax.lax.scan(
                micro, init, (stack(images), stack(noise), stack(timesteps))
            )
            inv = 1.0 / accumulate_steps
            loss = loss * inv
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = _ema_update(state, params, ema_decay)
        return TrainState(params, opt_state, state.step + 1, ema_params), loss

    if mesh is not None:
        rep = replicated(mesh)
        state_sharding = TrainState(
            params=rep,
            opt_state=rep,
            step=rep,
            ema_params=rep if ema_decay is not None else None,
        )
        return jax.jit(
            step,
            donate_argnums=(0,) if donate else (),
            out_shardings=(state_sharding, rep),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _ema_update(state: TrainState, params, ema_decay: float | None):
    """One EMA step with decay warmup (no-op when ema_decay is None).

    Warmup `min(decay, (1+step)/(10+step))` is the standard schedule
    (used by diffusers' EMAModel and most production diffusion trainers):
    the average starts as a near-copy of the live params and anneals
    toward the long decay, avoiding a random-init bias in the average.
    """
    if ema_decay is None:
        return state.ema_params
    if state.ema_params is None:
        raise ValueError(
            "ema_decay is set but state.ema_params is None — "
            "initialise with init_train_state(params, tx, ema=True)"
        )
    step = state.step.astype(jnp.float32)
    d = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        state.ema_params,
        params,
    )


def make_multi_step_train(
    model_apply: Callable,
    scheduler,
    tx: optax.GradientTransformation,
    steps_per_call: int,
    num_train_timesteps: int | None = None,
    prediction_target: str = "epsilon",
    donate: bool = True,
    ema_decay: float | None = None,
):
    """Build a jitted function running `steps_per_call` train steps per dispatch.

    The inner loop is a `lax.scan` over a stacked batch
    (steps_per_call, B, C, *spatial) — one host->device dispatch executes K
    optimizer updates, amortising launch latency (a large win through
    remote-dispatch links and for keeping the input pipeline ahead of the
    chip). Returns `fn(state, stacked_images, rng) -> (state, losses[K])`.
    """
    T = num_train_timesteps or scheduler.num_train_timesteps

    def one_step(state: TrainState, inputs):
        images, rng = inputs
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, images.shape, dtype=images.dtype)
        timesteps = jax.random.randint(k_t, (images.shape[0],), 0, T)

        def loss_fn(params):
            noisy = scheduler.add_noise(images, noise, timesteps)
            pred = model_apply(params, noisy, timesteps)
            if prediction_target == "epsilon":
                target = noise
            elif prediction_target == "v_prediction":
                target = scheduler.get_velocity(images, noise, timesteps)
            else:
                target = images
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = _ema_update(state, params, ema_decay)
        return TrainState(params, opt_state, state.step + 1, ema_params), loss

    def multi(state: TrainState, stacked_images, rng):
        rngs = jax.random.split(rng, steps_per_call)
        state, losses = jax.lax.scan(one_step, state, (stacked_images, rngs))
        return state, losses

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def init_train_state(
    params, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    """Build the initial TrainState; `ema=True` seeds ema_params = params."""
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(0),
        ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
    )
