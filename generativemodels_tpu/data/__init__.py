from .native import PrefetchNiftiLoader, load_library, read_nifti, write_nifti
from .pipeline import (
    batched,
    cached_dataset,
    file_dataset,
    prefetch_to_device,
    training_stream,
)

__all__ = [
    "PrefetchNiftiLoader",
    "load_library",
    "read_nifti",
    "write_nifti",
    "batched",
    "cached_dataset",
    "file_dataset",
    "prefetch_to_device",
    "training_stream",
]
