from .mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    shard_params,
    spatial_sharding,
)
from .multihost import (
    assemble_global_batch,
    global_batches,
    initialize_multihost,
    partition_files,
)
from .train import TrainState, init_train_state, make_diffusion_train_step, make_multi_step_train

__all__ = [
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "shard_params",
    "spatial_sharding",
    "assemble_global_batch",
    "global_batches",
    "initialize_multihost",
    "partition_files",
    "TrainState",
    "init_train_state",
    "make_diffusion_train_step",
    "make_multi_step_train",
]
