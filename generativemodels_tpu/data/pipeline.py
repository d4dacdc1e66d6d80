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
    PNG/TIFF both land in a consistent [0, 1]. One canonical
    implementation, shared with `native.read_image`'s PIL fallback.
    """
    from .native import _pil_decode

    return _pil_decode(path)


def _epoch_iter(paths: list[str], num_workers: int) -> Iterator[np.ndarray]:
    """One pass over `paths` (a single extension family, already ordered)."""
    first = paths[0].lower()
    if first.endswith(".npy"):
        for p in paths:
            yield np.load(p).astype(np.float32)
        return

    if first.endswith((".nii", ".nii.gz")) or all(
        p.lower().endswith((".png", ".jpg", ".jpeg")) for p in paths
    ):
        yielded = False
        try:
            from .native import PrefetchLoader

            # C++ worker pool: NIfTI decompression and PNG/JPEG decoding
            # run GIL-free, bounded ready-queue ahead of the consumer
            loader = PrefetchLoader(paths, num_workers=num_workers, loop=False)
            for arr in loader:
                yielded = True
                yield arr
            return
        except Exception:
            if yielded:
                # mid-epoch failure: restarting from paths[0] would
                # silently duplicate already-yielded samples
                raise
            if first.endswith((".nii", ".nii.gz")):
                from .native import read_nifti

                for p in paths:
                    yield read_nifti(p)
                return
            # no native toolchain for images: threaded PIL below

    from concurrent.futures import ThreadPoolExecutor

    # A deque of at most ~2*num_workers in-flight futures: decodes run
    # ahead of the consumer (PIL releases the GIL in zlib) but never
    # accumulate a whole epoch of float32 images in memory, and
    # abandoning the generator leaves only the small window to drain.
    window = max(2, 2 * num_workers)
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        futures: collections.deque = collections.deque()
        try:
            for p in paths:
                futures.append(pool.submit(_load_image, p))
                if len(futures) >= window:
                    yield futures.popleft().result()
            while futures:
                yield futures.popleft().result()
        finally:
            for f in futures:
                f.cancel()


def file_dataset(
    data_dir: str,
    pattern: str = "*",
    num_workers: int = 4,
    loop: bool = True,
    shuffle: bool = False,
    seed: int = 0,
    process_index: int | None = None,
    process_count: int | None = None,
) -> Iterator[np.ndarray]:
    """Yield float32 arrays from .nii/.nii.gz, PNG/JPEG (native C++
    loader), .npy, or other 2D images (threaded PIL decoding).

    With `shuffle=True` the file order is re-randomized every epoch from
    `seed` + epoch index (the torch `DataLoader(shuffle=True)` role in
    the reference tutorials, e.g. tutorials/generative/2d_ddpm/
    2d_ddpm_tutorial.py) — deterministic given `seed`, so a restarted
    run at a known epoch sees the same order.

    On a multi-host pod pass `process_index`/`process_count` (or leave
    them None with jax.distributed initialised — they default to
    jax.process_index/count): each host reads only its own strided slice
    of the per-epoch GLOBAL order, so shards are disjoint, cover the
    dataset, and reshuffle coherently across hosts (every host applies
    the identical seeded permutation before slicing — the reference's
    partition_dataset(shuffle=True) contract, ddpm_training_ddp.py:105).
    """
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
    # single-family dirs stream through the fast paths; mixed dirs use
    # whichever family is non-empty in priority order (nifti > image > npy)
    family = nifti_paths or image_paths or npy_paths

    if process_count is None:
        process_count = jax.process_count()
    multihost = process_count > 1 or process_index is not None

    epoch = 0
    while True:
        epoch_paths = family
        if shuffle:
            rng = np.random.RandomState((seed + epoch) & 0x7FFFFFFF)
            epoch_paths = list(family)
            rng.shuffle(epoch_paths)
        if multihost:
            from ..parallel.multihost import partition_files

            epoch_paths = partition_files(epoch_paths, process_index, process_count)
        count = 0
        for arr in _epoch_iter(epoch_paths, num_workers):
            count += 1
            yield arr
        if count == 0:
            # every file failed to decode: looping would spin forever
            raise IOError(
                f"no readable samples among {len(family)} files in {data_dir}"
            )
        epoch += 1
        if not loop:
            return


def cached_dataset(
    source: Iterable[np.ndarray],
    shuffle: bool = True,
    seed: int = 0,
    loop: bool = True,
    max_bytes: int | None = 8 * 2**30,
) -> Iterator[np.ndarray]:
    """Materialise a finite sample stream in host RAM once, then re-yield
    it every epoch without re-decoding (the reference CacheDataset role,
    tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:126).

    `source` must be finite (e.g. `file_dataset(..., loop=False)`) and
    should contain only *deterministic* preprocessing — cache after
    `fitted_stream`, before `augmented_stream`, so per-epoch random
    augmentation stays fresh (MONAI caches the deterministic prefix of
    the transform chain the same way). Epoch order is reshuffled from
    `seed` + epoch index; `max_bytes` guards against accidentally caching
    a larger-than-RAM dataset (None disables the guard).
    """
    samples: list[np.ndarray] = []
    total = 0
    for a in source:
        a = np.asarray(a)
        total += a.nbytes
        if max_bytes is not None and total > max_bytes:
            raise MemoryError(
                f"cached_dataset exceeds max_bytes={max_bytes} after "
                f"{len(samples) + 1} samples; raise the limit or stream "
                "with file_dataset(shuffle=True) instead"
            )
        samples.append(a)
    if not samples:
        raise ValueError("cached_dataset: source yielded no samples")
    epoch = 0
    while True:
        order = np.arange(len(samples))
        if shuffle:
            np.random.RandomState((seed + epoch) & 0x7FFFFFFF).shuffle(order)
        for i in order:
            yield samples[i]
        epoch += 1
        if not loop:
            return


def training_stream(
    data_dir: str,
    shape,
    fit: str = "crop_pad",
    cache: bool = False,
    augment: bool = False,
    seed: int = 0,
) -> Iterator[np.ndarray]:
    """The full host-side training stream the recipes share: decode ->
    fit to `shape` -> (optional) RAM cache -> (optional) tutorial-default
    random affine (rotate ±pi/36, translate ±1 px, scale ±5%, prob 0.5 —
    tutorials/generative/2d_ddpm/2d_ddpm_tutorial.py:115-123)."""
    from .transforms import augmented_stream, ensure_channel_first, fitted_stream

    nd = len(tuple(shape))

    def _fitted(source):
        return fitted_stream(
            (ensure_channel_first(a, nd) for a in source), shape, fit
        )

    if cache:
        stream: Iterator[np.ndarray] = cached_dataset(
            _fitted(file_dataset(data_dir, loop=False)), shuffle=True, seed=seed,
        )
    else:
        stream = _fitted(file_dataset(data_dir, shuffle=True, seed=seed))
    if augment:
        stream = augmented_stream(
            stream, seed=seed, rotate_range=np.pi / 36, translate_range=1.0,
            scale_range=0.05, prob=0.5, spatial_dims=nd,
        )
    return stream


def device_batches(
    data_dir: str,
    shape,
    batch: int,
    fit: str = "crop_pad",
    cache: bool = False,
    augment: bool = False,
    seed: int = 0,
    prefetch: int = 2,
) -> Iterator:
    """`training_stream` → `batched` → (B, 1, *shape) float32 → device.

    The one shared `--data-dir` consumption path of the training recipes:
    fitted single-channel samples are stacked, reshaped to the NCHW/NCDHW
    layout the nets expect, and kept `prefetch` batches in flight on
    device ahead of the jitted step.
    """
    import jax.numpy as jnp

    stream = training_stream(
        data_dir, shape, fit, cache=cache, augment=augment, seed=seed
    )
    target = (batch, 1) + tuple(shape)
    return prefetch_to_device(
        (jnp.asarray(b, jnp.float32).reshape(target)
         for b in batched(stream, batch)),
        size=prefetch,
    )


def multihost_device_batches(
    data_dir: str,
    shape,
    global_batch: int,
    mesh,
    fit: str = "crop_pad",
    cache: bool = False,
    augment: bool = False,
    seed: int = 0,
    prefetch: int = 2,
) -> Iterator:
    """`device_batches` for a multi-host pod: each host decodes only its
    own file partition (file_dataset's process slicing) and contributes a
    (global_batch / process_count)-sized local batch; the yielded arrays
    are GLOBAL jax.Arrays sharded over the mesh's "data" axis, assembled
    with jax.make_array_from_process_local_data — the jitted train step
    downstream is identical to the single-host path.

    Reference surface: tutorials/generative/distributed_training/
    ddpm_training_ddp.py:105-125 (per-rank partition + DistributedSampler).
    """
    from ..parallel.multihost import global_batches

    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} must divide evenly across "
            f"{pc} processes"
        )
    local = global_batch // pc
    stream = training_stream(
        data_dir, shape, fit, cache=cache, augment=augment, seed=seed
    )
    target = (local, 1) + tuple(shape)
    local_iter = (
        np.asarray(b, np.float32).reshape(target) for b in batched(stream, local)
    )
    return global_batches(local_iter, mesh, prefetch=prefetch)


def _read_any(path: str) -> np.ndarray:
    """Read one sample file by extension (npy / NIfTI / image)."""
    from . import native

    p = path.lower()
    if p.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if p.endswith((".nii", ".nii.gz")):
        return native.read_nifti(path)
    return native.read_image(path)


def _read_label(path: str) -> np.ndarray:
    """Read a label map keeping RAW integer class values.

    Image decoders (native and PIL) rescale by the source bit depth —
    right for intensities, wrong for class ids ({0,1,2} would become
    {0, 1/255, 2/255} and one-hot to all-background). PNG/etc. label
    maps therefore decode without any scaling; npy/NIfTI label files
    already come through _read_any unscaled.
    """
    if path.lower().endswith(_IMAGE_EXTS):
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im).astype(np.float32)
    return _read_any(path)


def paired_stream(
    image_dir: str,
    label_dir: str,
    shape,
    fit: str = "crop_pad",
    seed: int = 0,
    loop: bool = True,
    process_index: int | None = None,
    process_count: int | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Aligned (image, label) pairs for conditional recipes (the torch
    dict-dataset role in the reference SPADE / image-to-image tutorials).

    Files in the two directories are matched by sorted order (counts must
    match — name labels like their images); each epoch applies ONE seeded
    permutation to both, keeping pairs aligned. Images are intensity-
    rescaled to [0, 1] and fitted with the requested mode; label maps
    keep their raw integer values and fit with nearest-neighbour
    semantics (zero-pad, or order=0 resize).

    Multi-host pods partition pairs exactly like `file_dataset`: each
    host takes its strided slice of the per-epoch GLOBAL permutation
    (disjoint, covering, lockstep-truncated; auto when
    jax.process_count() > 1).
    """
    from .transforms import ensure_channel_first, fit_sample

    exts = (".nii", ".nii.gz", ".npy") + _IMAGE_EXTS
    list_dir = lambda d: sorted(
        p for p in glob.glob(os.path.join(d, "*")) if p.lower().endswith(exts)
    )
    images, labels = list_dir(image_dir), list_dir(label_dir)
    if not images:
        raise FileNotFoundError(f"no samples under {image_dir}")
    if len(images) != len(labels):
        raise ValueError(
            f"{len(images)} images vs {len(labels)} labels — directories "
            "must pair 1:1 by sorted filename"
        )

    if process_count is None:
        process_count = jax.process_count()
    multihost = process_count > 1 or process_index is not None

    nd = len(tuple(shape))
    epoch = 0
    while True:
        order = np.arange(len(images))
        rng = np.random.RandomState((seed + epoch) & 0x7FFFFFFF)
        rng.shuffle(order)
        if multihost:
            from ..parallel.multihost import partition_files

            order = partition_files(list(order), process_index, process_count)
        for i in order:
            img = ensure_channel_first(_read_any(images[i]), nd)
            lab = ensure_channel_first(_read_label(labels[i]), nd)
            if fit == "none":  # same pass-through contract as fitted_stream
                yield img, lab
            else:
                yield (
                    fit_sample(img, shape, fit),
                    fit_sample(lab, shape, fit, rescale_intensity=False, order=0),
                )
        epoch += 1
        if not loop:
            return


def _chunks(source: Iterable, batch_size: int) -> Iterator[list]:
    """Group an iterator into full lists of `batch_size` (drops remainder)."""
    buf: list = []
    for item in source:
        buf.append(item)
        if len(buf) == batch_size:
            yield buf
            buf = []


def batched(source: Iterable[np.ndarray], batch_size: int) -> Iterator[np.ndarray]:
    """Stack fixed-shape samples into (B, ...) batches (drops remainder)."""
    return (np.stack(buf) for buf in _chunks(source, batch_size))


def batched_pairs(source: Iterable[tuple], batch_size: int) -> Iterator[tuple]:
    """Stack an iterator of sample tuples into tuples of (B, ...) batches
    (drops remainder) — `batched` for paired_stream output."""
    return (
        tuple(np.stack(part) for part in zip(*buf))
        for buf in _chunks(source, batch_size)
    )


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
