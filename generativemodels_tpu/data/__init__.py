from .native import PrefetchNiftiLoader, load_library, read_nifti, write_nifti
from .pipeline import (
    batched,
    batched_pairs,
    cached_dataset,
    device_batches,
    file_dataset,
    multihost_device_batches,
    paired_stream,
    prefetch_to_device,
    training_stream,
)

__all__ = [
    "PrefetchNiftiLoader",
    "load_library",
    "read_nifti",
    "write_nifti",
    "batched",
    "batched_pairs",
    "cached_dataset",
    "device_batches",
    "file_dataset",
    "multihost_device_batches",
    "paired_stream",
    "prefetch_to_device",
    "training_stream",
]
