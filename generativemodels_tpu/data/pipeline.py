"""Batching + device-prefetch utilities on top of the native loader.

Completes the data path: file iteration (native threaded NIfTI loader or
.npy), batching, and a device prefetcher that keeps N batches in flight so
host->device copies overlap TPU compute (the torch-DataLoader+pin_memory
role in the reference tutorials).
"""
from __future__ import annotations

import collections
import glob
import os
from typing import Iterable, Iterator

import jax
import numpy as np


_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def _load_image(path: str) -> np.ndarray:
    """Decode a 2D image to float32 [0, 1], grayscale kept single-channel.

    Scaling uses the *source dtype's* range (np.iinfo for integer modes),
    not the observed pixel max, so near-black uint8 images and 16-bit
    PNG/TIFF both land in a consistent [0, 1].
    """
    from PIL import Image

    with Image.open(path) as im:
        raw = np.asarray(im)
    arr = raw.astype(np.float32)
    if np.issubdtype(raw.dtype, np.integer):
        arr = arr / float(np.iinfo(raw.dtype).max)
    return arr


def file_dataset(
    data_dir: str,
    pattern: str = "*",
    num_workers: int = 4,
    loop: bool = True,
) -> Iterator[np.ndarray]:
    """Yield float32 arrays from .nii/.nii.gz (native loader), .npy, or
    2D image files (PNG/JPEG/... — e.g. MedNIST) with threaded decoding."""
    exts = (".nii", ".nii.gz", ".npy") + _IMAGE_EXTS
    paths = sorted(
        p for p in glob.glob(os.path.join(data_dir, pattern))
        if p.lower().endswith(exts)
    )
    if not paths:
        raise FileNotFoundError(
            f"no {'/'.join(exts)} files under {data_dir}/{pattern}"
        )

    nifti_paths = [p for p in paths if p.endswith((".nii", ".nii.gz"))]
    npy_paths = [p for p in paths if p.endswith(".npy")]
    image_paths = [p for p in paths if p.lower().endswith(_IMAGE_EXTS)]

    if nifti_paths and not npy_paths and not image_paths:
        from .native import PrefetchNiftiLoader

        loader = PrefetchNiftiLoader(nifti_paths, num_workers=num_workers, loop=loop)
        yield from iter(loader)
        return

    if image_paths and not npy_paths and not nifti_paths:
        native_decodable = all(
            p.lower().endswith((".png", ".jpg", ".jpeg")) for p in image_paths
        )
        if native_decodable:
            try:
                from .native import PrefetchLoader

                loader = PrefetchLoader(
                    image_paths, num_workers=num_workers, loop=loop
                )
                yield from iter(loader)
                return
            except Exception:
                pass  # no native toolchain: threaded PIL below

        from concurrent.futures import ThreadPoolExecutor

        def path_stream():
            while True:
                yield from image_paths
                if not loop:
                    return

        # A deque of at most ~2*num_workers in-flight futures: decodes run
        # ahead of the consumer (PIL releases the GIL in zlib) but never
        # accumulate a whole epoch of float32 images in memory, and
        # abandoning the generator leaves only the small window to drain.
        window = max(2, 2 * num_workers)
        with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            futures: collections.deque = collections.deque()
            stream = path_stream()
            try:
                for p in stream:
                    futures.append(pool.submit(_load_image, p))
                    if len(futures) >= window:
                        yield futures.popleft().result()
                while futures:
                    yield futures.popleft().result()
            finally:
                for f in futures:
                    f.cancel()
        return

    while True:
        for p in npy_paths:
            yield np.load(p).astype(np.float32)
        if not loop:
            return


def batched(source: Iterable[np.ndarray], batch_size: int) -> Iterator[np.ndarray]:
    """Stack fixed-shape samples into (B, ...) batches (drops remainder)."""
    buf = []
    for item in source:
        buf.append(item)
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []


def prefetch_to_device(iterator: Iterable, size: int = 2, devices=None) -> Iterator:
    """Keep `size` batches in flight on device ahead of the consumer.

    jax.device_put is async: enqueueing the next batches' transfers before
    the consumer needs them overlaps host->device copies with compute.
    """
    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(iterator)
            except StopIteration:
                return
            queue.append(jax.tree_util.tree_map(jax.device_put, batch))

    iterator = iter(iterator)
    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
