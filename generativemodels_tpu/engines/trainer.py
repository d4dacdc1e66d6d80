"""Adversarial (G/D) training engine, TPU-native.

Reference parity: generative/engines/trainer.py:40-318 (AdversarialTrainer's
_iteration: G forward -> D(fakes) -> recon + adversarial G loss -> G step;
D(reals)/D(stop_grad(fakes)) -> D loss -> D step; output dict keyed by
AdversarialKeys; 11 AdversarialIterationEvents hook points).

TPU-first design: both phases fuse into ONE jitted step returning both new
optimizer states (the BASELINE north-star asks for exactly this). The
Ignite event stream collapses to per-iteration callbacks that receive the
full output dict — sub-stage events cannot fire mid-step under jit, so all
events are delivered together after each fused step.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..utils import AdversarialIterationEvents, AdversarialKeys


class AdversarialTrainState(NamedTuple):
    """Pytree carrying both networks' params/state and optimizer states."""

    g_params: Any
    g_model_state: Any  # non-param collections (codebook, batch_stats), may be {}
    g_opt_state: Any
    d_params: Any
    d_model_state: Any
    d_opt_state: Any
    step: jnp.ndarray
    # EMA of g_params (None unless the step was built with ema_decay);
    # the generator average is what VQ-GAN/AEKL users deploy. Old
    # checkpoints restore unchanged: None has no pytree leaves.
    g_ema_params: Any = None


def make_adversarial_train_step(
    g_forward: Callable,
    d_forward: Callable,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    recon_loss_fn: Callable,
    g_loss_fn: Callable,
    d_loss_fn: Callable,
    adv_weight: float = 1.0,
    donate: bool = True,
    ema_decay: float | None = None,
):
    """Builds a fused jitted G+D train step.

    Args:
        g_forward: `(params, model_state, inputs, rng) -> (fakes, new_model_state)`.
        d_forward: `(params, model_state, images) -> (logits_or_list, new_model_state)`.
        g_tx / d_tx: optax optimizers for G and D.
        recon_loss_fn: `(fakes, targets) -> scalar`.
        g_loss_fn: `(fake_logits) -> scalar` adversarial generator loss.
        d_loss_fn: `(real_logits, fake_logits) -> scalar` discriminator loss.
        adv_weight: weight of the adversarial term in the G loss.
        donate: donate the state argument (in-place buffer reuse on TPU).
        ema_decay: if set, maintain an EMA of g_params in
            `state.g_ema_params` (seed it with the initial g_params);
            decay warms up as min(ema_decay, (1+step)/(10+step)).

    Returns:
        `step(state, inputs, targets, rng) -> (new_state, outputs)` where
        outputs is a dict keyed by AdversarialKeys (all losses + fakes).
    """

    def step(state: AdversarialTrainState, inputs, targets, rng):
        g_rng, _ = jax.random.split(rng)

        # --- generator phase -------------------------------------------------
        def g_loss(g_params):
            fakes, new_g_state = g_forward(g_params, state.g_model_state, inputs, g_rng)
            fake_logits, _ = d_forward(state.d_params, state.d_model_state, fakes)
            recon_loss = recon_loss_fn(fakes, targets)
            adv_loss = g_loss_fn(fake_logits)
            total = recon_loss + adv_weight * adv_loss
            return total, (fakes, new_g_state, recon_loss, adv_loss)

        (g_total, (fakes, new_g_state, recon_loss, adv_loss)), g_grads = (
            jax.value_and_grad(g_loss, has_aux=True)(state.g_params)
        )
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        # --- discriminator phase --------------------------------------------
        fakes_detached = jax.lax.stop_gradient(fakes)

        def d_loss(d_params):
            real_logits, new_d_state = d_forward(d_params, state.d_model_state, inputs)
            fake_logits, new_d_state = d_forward(d_params, new_d_state, fakes_detached)
            loss = d_loss_fn(real_logits, fake_logits)
            return loss, (real_logits, fake_logits, new_d_state)

        (d_total, (real_logits, fake_logits, new_d_state)), d_grads = (
            jax.value_and_grad(d_loss, has_aux=True)(state.d_params)
        )
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        g_ema = state.g_ema_params
        if ema_decay is not None:
            if g_ema is None:
                raise ValueError(
                    "ema_decay is set but state.g_ema_params is None — seed "
                    "it with the initial g_params"
                )
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            g_ema = jax.tree_util.tree_map(
                lambda e, q: e * d + q.astype(e.dtype) * (1.0 - d),
                g_ema, new_g_params,
            )

        new_state = AdversarialTrainState(
            g_params=new_g_params,
            g_model_state=new_g_state,
            g_opt_state=new_g_opt,
            d_params=new_d_params,
            d_model_state=new_d_state,
            d_opt_state=new_d_opt,
            step=state.step + 1,
            g_ema_params=g_ema,
        )
        outputs = {
            AdversarialKeys.REALS: inputs,
            AdversarialKeys.FAKES: fakes,
            AdversarialKeys.RECONSTRUCTION_LOSS: recon_loss,
            AdversarialKeys.GENERATOR_LOSS: adv_loss,
            AdversarialKeys.DISCRIMINATOR_LOSS: d_total,
            "loss": g_total,
        }
        return new_state, outputs

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


class AdversarialTrainer:
    """Epoch/iteration loop around the fused adversarial step.

    Args:
        train_data_loader: iterable of (inputs, targets) or inputs arrays
            (unsupervised: targets = inputs).
        max_epochs: number of epochs to run.
        Everything else: see make_adversarial_train_step.
        handlers: mapping from AdversarialIterationEvents (or the strings
            "iteration_completed" / "epoch_completed") to callbacks
            `cb(trainer, outputs)`.
    """

    def __init__(
        self,
        train_data_loader,
        max_epochs: int,
        g_forward: Callable,
        d_forward: Callable,
        g_tx: optax.GradientTransformation,
        d_tx: optax.GradientTransformation,
        recon_loss_function: Callable,
        g_loss_function: Callable,
        d_loss_function: Callable,
        initial_state: AdversarialTrainState,
        adv_weight: float = 1.0,
        handlers: dict | None = None,
        rng: jax.Array | None = None,
        ema_decay: float | None = None,
    ) -> None:
        self.data_loader = train_data_loader
        self.max_epochs = max_epochs
        self.state = initial_state
        self.handlers = handlers or {}
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.iteration = 0
        self.epoch = 0
        self.output: dict | None = None
        self._step = make_adversarial_train_step(
            g_forward,
            d_forward,
            g_tx,
            d_tx,
            recon_loss_function,
            g_loss_function,
            d_loss_function,
            adv_weight=adv_weight,
            ema_decay=ema_decay,
        )
        if ema_decay is not None and initial_state.g_ema_params is None:
            # seed the average from the initial generator params
            self.state = initial_state._replace(
                g_ema_params=jax.tree_util.tree_map(
                    jnp.array, initial_state.g_params
                )
            )

    def _fire(self, event, outputs):
        cb = self.handlers.get(event)
        if cb is not None:
            cb(self, outputs)

    def run(self) -> AdversarialTrainState:
        for _ in range(self.max_epochs):
            self.epoch += 1
            for batch in self.data_loader:
                if isinstance(batch, (tuple, list)) and len(batch) == 2:
                    inputs, targets = batch
                else:
                    inputs = targets = batch
                self.rng, sub = jax.random.split(self.rng)
                self.state, outputs = self._step(self.state, inputs, targets, sub)
                self.output = outputs
                self.iteration += 1
                # jit-fused step: all sub-stage events deliver together
                for event in AdversarialIterationEvents:
                    self._fire(event, outputs)
                self._fire("iteration_completed", outputs)
            self._fire("epoch_completed", self.output)
        return self.state
