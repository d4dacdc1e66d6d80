from .native import PrefetchNiftiLoader, load_library, read_nifti, write_nifti
from .pipeline import batched, file_dataset, prefetch_to_device

__all__ = [
    "PrefetchNiftiLoader",
    "load_library",
    "read_nifti",
    "write_nifti",
    "batched",
    "file_dataset",
    "prefetch_to_device",
]
