from .native import PrefetchNiftiLoader, load_library, read_nifti, write_nifti

__all__ = ["PrefetchNiftiLoader", "load_library", "read_nifti", "write_nifti"]
