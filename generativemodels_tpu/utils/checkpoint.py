"""Checkpoint / resume via Orbax.

Reference parity: the reference delegates checkpointing to Ignite/MONAI
handlers (tests/test_integration_workflows_adversarial.py:111-116, bundle
train.yaml:118-134 CheckpointSaver/Loader; AdversarialTrainer's
_state_dict_user_keys covering both optimizers, trainer.py:161-183).
Here any pytree (params, opt states, EMA codebook collections, step
counters) checkpoints through one API; Orbax handles multiprocess
coordination on real slices.
"""
from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for train-state pytrees.

    Args:
        directory: checkpoint root (created if missing).
        max_to_keep: retention policy.
    """

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Save a pytree at `step`."""
        saved = self._manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._manager.wait_until_finished()
        return saved

    def restore(self, step: int | None = None, template: Any | None = None) -> Any:
        """Restore the pytree at `step` (default: latest).

        `template` (a pytree of like-shaped arrays) restores with correct
        dtypes/shardings; omit to get raw arrays.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            return self._manager.restore(step, args=ocp.args.StandardRestore(template))
        return self._manager.restore(step)

    def latest_step(self) -> int | None:
        return self._manager.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._manager.all_steps())

    def close(self) -> None:
        self._manager.close()


def migrate_legacy_conv_params(params: Any) -> Any:
    """Remap a round-1 checkpoint's conv params to the current tree.

    Round 2 made ConvND/ConvTransposeND own their kernel/bias directly,
    flattening `.../conv/Conv_0/kernel` to `.../conv/kernel` (same for
    `ConvTranspose_0`). This strips that one nesting level from an old
    params pytree so round-1 checkpoints load into current models.
    """
    if not isinstance(params, dict):
        return params
    out = {}
    for key, value in params.items():
        value = migrate_legacy_conv_params(value)
        if (
            isinstance(value, dict)
            and set(value) <= {"Conv_0", "ConvTranspose_0"}
            and len(value) == 1
        ):
            inner = next(iter(value.values()))
            if isinstance(inner, dict) and set(inner) <= {"kernel", "bias"}:
                value = inner
        out[key] = value
    return out
