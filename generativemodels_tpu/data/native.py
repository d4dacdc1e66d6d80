"""ctypes bindings for the native data pipeline (native/dataloader.cpp).

Provides NIfTI-1 volume reading and a multi-threaded prefetch loader so
host IO overlaps TPU compute — the native equivalent of the reference's
torch DataLoader worker processes. A pure-python NIfTI fallback keeps the
API usable without the compiled library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgmtpu_data.so")
_lib = None


def _build_library() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def load_library(build_if_missing: bool = True) -> ctypes.CDLL:
    """Load (building on first use) the native data library.

    A stale previously-built library missing newer symbols triggers one
    rebuild (the .so existing is not proof it is current); the rebuilt
    file is loaded under a unique temp path since dlopen may dedup an
    in-place rewrite against the already-open stale handle.
    """
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        _build_library()
    try:
        _lib = _bind_symbols(ctypes.CDLL(_LIB_PATH))
    except AttributeError:
        if not build_if_missing:
            raise
        _build_library()
        import shutil
        import tempfile

        tmp = tempfile.NamedTemporaryFile(suffix=".so", delete=False)
        tmp.close()
        shutil.copy2(_LIB_PATH, tmp.name)
        _lib = _bind_symbols(ctypes.CDLL(tmp.name))
    return _lib


def _bind_symbols(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.gmtpu_read_nifti.argtypes = [ctypes.c_char_p]
    lib.gmtpu_read_nifti.restype = ctypes.c_void_p
    lib.gmtpu_read_image.argtypes = [ctypes.c_char_p]
    lib.gmtpu_read_image.restype = ctypes.c_void_p
    lib.gmtpu_volume_ndim.argtypes = [ctypes.c_void_p]
    lib.gmtpu_volume_ndim.restype = ctypes.c_int
    lib.gmtpu_volume_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.gmtpu_volume_data.argtypes = [ctypes.c_void_p]
    lib.gmtpu_volume_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.gmtpu_volume_free.argtypes = [ctypes.c_void_p]
    lib.gmtpu_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gmtpu_loader_create.restype = ctypes.c_void_p
    lib.gmtpu_loader_next.argtypes = [ctypes.c_void_p]
    lib.gmtpu_loader_next.restype = ctypes.c_void_p
    lib.gmtpu_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _volume_to_array(lib, handle) -> np.ndarray:
    ndim = lib.gmtpu_volume_ndim(handle)
    shape = (ctypes.c_int64 * ndim)()
    lib.gmtpu_volume_shape(handle, shape)
    shape = tuple(int(s) for s in shape)
    count = int(np.prod(shape))
    data_ptr = lib.gmtpu_volume_data(handle)
    arr = np.ctypeslib.as_array(data_ptr, shape=(count,)).reshape(shape).copy()
    lib.gmtpu_volume_free(handle)
    return arr


def read_nifti(path: str, native: bool = True) -> np.ndarray:
    """Read a .nii / .nii.gz volume into a float32 array (C order).

    Note the returned axis order is the reverse of the NIfTI on-disk
    (Fortran) dim order — i.e. (dimN, ..., dim1), matching C indexing of
    the raw buffer.
    """
    if native:
        try:
            lib = load_library()
            handle = lib.gmtpu_read_nifti(path.encode())
            if handle:
                return _volume_to_array(lib, handle)
            raise IOError(f"native NIfTI reader failed for {path}")
        except (OSError, subprocess.CalledProcessError, AttributeError):
            pass  # fall through to pure python
    return _read_nifti_py(path)


def read_image(path: str, native: bool = True) -> np.ndarray:
    """Decode a PNG/JPEG to float32 in [0, 1] ((H, W) or (H, W, C)).

    Scaling is by the source bit depth (255 / 65535), matching
    `data.pipeline._load_image`'s dtype-range normalization. Uses the
    C++ decoders (libpng/libjpeg, GIL-free); falls back to PIL when the
    native library is unavailable.
    """
    if native:
        try:
            lib = load_library()
            handle = lib.gmtpu_read_image(path.encode())
            if handle:
                return _volume_to_array(lib, handle)
            raise IOError(f"native image decode failed for {path}")
        except (OSError, subprocess.CalledProcessError, AttributeError):
            pass  # fall through to PIL
    return _pil_decode(path)


def _pil_decode(path: str) -> np.ndarray:
    """Canonical PIL decode: float32, scaled by the source dtype's range
    (np.iinfo for integer modes) so near-black uint8 and 16-bit images
    land in a consistent [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        raw = np.asarray(im)
    arr = raw.astype(np.float32)
    if np.issubdtype(raw.dtype, np.integer):
        arr = arr / float(np.iinfo(raw.dtype).max)
    return arr


def _read_nifti_py(path: str) -> np.ndarray:
    """Pure-python NIfTI-1 fallback reader."""
    import gzip
    import struct

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()
    if len(raw) < 348 or struct.unpack("<i", raw[:4])[0] != 348:
        raise IOError(f"not a NIfTI-1 file: {path}")
    dim = struct.unpack("<8h", raw[40:56])
    datatype, bitpix = struct.unpack("<2h", raw[70:74])
    vox_offset = struct.unpack("<f", raw[108:112])[0]
    scl_slope, scl_inter = struct.unpack("<2f", raw[112:120])
    ndim = dim[0]
    shape = tuple(dim[1 : 1 + ndim])[::-1]
    dtypes = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
              256: np.int8, 512: np.uint16, 768: np.uint32}
    if datatype not in dtypes:
        raise IOError(f"unsupported NIfTI datatype {datatype}")
    offset = int(vox_offset) if vox_offset >= 348 else 352
    count = int(np.prod(shape))
    data = np.frombuffer(raw, dtype=dtypes[datatype], count=count, offset=offset)
    slope = scl_slope if scl_slope != 0 else 1.0
    return (data.astype(np.float32) * slope + scl_inter).reshape(shape)


def write_nifti(path: str, array: np.ndarray) -> None:
    """Write a float32 array as an (uncompressed) minimal NIfTI-1 file."""
    import struct

    array = np.asarray(array, np.float32)
    ndim = array.ndim
    dim = [ndim] + list(array.shape[::-1]) + [1] * (7 - ndim)
    header = bytearray(348)
    struct.pack_into("<i", header, 0, 348)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<2h", header, 70, 16, 32)  # float32, 32 bits
    struct.pack_into("<8f", header, 76, *([1.0] * 8))  # pixdim
    struct.pack_into("<f", header, 108, 352.0)  # vox_offset
    struct.pack_into("<2f", header, 112, 1.0, 0.0)  # slope/inter
    header[344:348] = b"n+1\x00"
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(b"\x00" * 4)  # extension flag
        f.write(array.tobytes())


class PrefetchNiftiLoader:
    """Multi-threaded prefetch loader (native worker pool).

    Iterates float32 numpy arrays; IO, decompression and decoding run in
    C++ threads that stay ahead of the consumer by up to `max_queue`
    items. Workers dispatch per file by extension: .png/.jpg/.jpeg use
    the libpng/libjpeg decoders, everything else the NIfTI reader.
    """

    def __init__(self, paths: list[str], num_workers: int = 4, max_queue: int = 8,
                 loop: bool = False) -> None:
        self._lib = load_library()
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = self._lib.gmtpu_loader_create(
            arr, len(paths), num_workers, max_queue, int(loop)
        )
        self._n = len(paths)
        self.loop = loop

    def __iter__(self):
        while True:
            handle = self._lib.gmtpu_loader_next(self._handle)
            if not handle:
                return
            yield _volume_to_array(self._lib, handle)

    def close(self) -> None:
        if self._handle:
            self._lib.gmtpu_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# The loader dispatches by extension (NIfTI / PNG / JPEG) — keep the
# historical name importable but prefer the format-neutral alias.
PrefetchLoader = PrefetchNiftiLoader
