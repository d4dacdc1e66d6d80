from .mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    shard_params,
    spatial_sharding,
)
from .train import TrainState, init_train_state, make_diffusion_train_step, make_multi_step_train

__all__ = [
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "shard_params",
    "spatial_sharding",
    "TrainState",
    "init_train_state",
    "make_diffusion_train_step",
    "make_multi_step_train",
]
