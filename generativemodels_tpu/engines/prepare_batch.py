"""Batch preparation for diffusion training.

Reference parity: generative/engines/prepare_batch.py:21-92
(DiffusionPrepareBatch draws noise + uniform random timesteps and returns
(images, target, kwargs); VPredictionPrepareBatch targets the scheduler's
velocity). JAX version: explicit PRNG keys, dict or array batches.
"""
from __future__ import annotations

import jax


class DiffusionPrepareBatch:
    """Prepares (images, target=noise, {"noise", "timesteps"[, "conditioning"]}).

    Use with a vanilla supervised train loop: the network is expected to be
    called with the noisy image at `timesteps` and regress `target`.
    """

    def __init__(
        self,
        num_train_timesteps: int,
        condition_name: str | None = None,
        image_key: str = "image",
    ) -> None:
        self.condition_name = condition_name
        self.num_train_timesteps = num_train_timesteps
        self.image_key = image_key

    def get_target(self, images, noise, timesteps):
        return noise

    def get_noise(self, images, key: jax.Array):
        """Overridable noise draw (reference:
        generative/engines/prepare_batch.py:50 `get_noise`; explicit key
        here instead of torch's global RNG)."""
        return jax.random.normal(key, images.shape, dtype=images.dtype)

    def get_timesteps(self, images, key: jax.Array):
        """Overridable uniform timestep draw (reference:
        generative/engines/prepare_batch.py:54 `get_timesteps`)."""
        return jax.random.randint(
            key, (images.shape[0],), 0, self.num_train_timesteps
        )

    def __call__(self, batchdata, key: jax.Array):
        if isinstance(batchdata, dict):
            images = batchdata[self.image_key]
        else:
            images = batchdata
        k_noise, k_t = jax.random.split(key)
        noise = self.get_noise(images, k_noise)
        timesteps = self.get_timesteps(images, k_t)

        target = self.get_target(images, noise, timesteps)
        kwargs = {"noise": noise, "timesteps": timesteps}
        if self.condition_name is not None and isinstance(batchdata, dict):
            kwargs["conditioning"] = batchdata[self.condition_name]
        return images, target, kwargs


class VPredictionPrepareBatch(DiffusionPrepareBatch):
    """Same as DiffusionPrepareBatch but targets the velocity."""

    def __init__(
        self,
        scheduler,
        num_train_timesteps: int,
        condition_name: str | None = None,
        image_key: str = "image",
    ) -> None:
        super().__init__(num_train_timesteps, condition_name, image_key)
        self.scheduler = scheduler

    def get_target(self, images, noise, timesteps):
        return self.scheduler.get_velocity(images, noise, timesteps)
