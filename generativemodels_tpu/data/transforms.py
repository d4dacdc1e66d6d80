"""Minimal host-side spatial/intensity transforms for --data-dir recipes.

The reference reaches its preprocessing through MONAI core transforms
(an external foundation per SURVEY.md §1 — e.g. the 3D tutorials compose
ScaleIntensity + CenterSpatialCrop/Resize before batching,
tutorials/generative/3d_ddpm/3d_ddpm_tutorial.py). This module provides
just enough of that surface to feed real-size datasets (BraTS
240x240x155, full-res MedNIST, ...) into the fixed-shape jitted train
steps: dtype-safe intensity scaling, center crop/pad, and an
interpolating resize. All functions are numpy (host) — samples are
fitted before batching/device prefetch, keeping XLA shapes static.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def scale_intensity(arr: np.ndarray, out_min: float = 0.0, out_max: float = 1.0) -> np.ndarray:
    """Min-max rescale to [out_min, out_max] (reference ScaleIntensity)."""
    arr = np.asarray(arr, np.float32)
    lo, hi = float(arr.min()), float(arr.max())
    if hi <= lo:
        return np.full_like(arr, out_min)
    return (arr - lo) / (hi - lo) * (out_max - out_min) + out_min


def center_crop_or_pad(arr: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Center-crop and/or zero-pad trailing spatial dims to `shape`.

    `arr` may carry leading non-spatial dims (e.g. channels); only the
    last len(shape) axes are fitted (reference CenterSpatialCrop +
    SpatialPad semantics, symmetric remainder-to-the-end).
    """
    arr = np.asarray(arr)
    nd = len(shape)
    lead = arr.ndim - nd
    if lead < 0:
        raise ValueError(f"array rank {arr.ndim} < target rank {nd}")
    slices = [slice(None)] * lead
    pads = [(0, 0)] * lead
    for cur, tgt in zip(arr.shape[lead:], shape):
        if cur > tgt:
            start = (cur - tgt) // 2
            slices.append(slice(start, start + tgt))
            pads.append((0, 0))
        else:
            slices.append(slice(None))
            lo = (tgt - cur) // 2
            pads.append((lo, tgt - cur - lo))
    out = arr[tuple(slices)]
    if any(p != (0, 0) for p in pads):
        out = np.pad(out, pads)
    return out


def resize(arr: np.ndarray, shape: Sequence[int], order: int = 1) -> np.ndarray:
    """Interpolating resize of the trailing spatial dims to `shape`.

    order=1 is linear (reference Resize default mode for images);
    order=0 nearest (label maps).
    """
    from scipy import ndimage

    arr = np.asarray(arr, np.float32)
    nd = len(shape)
    lead = arr.ndim - nd
    if lead < 0:
        raise ValueError(f"array rank {arr.ndim} < target rank {nd}")
    zoom = [1.0] * lead + [t / c for c, t in zip(arr.shape[lead:], shape)]
    if all(z == 1.0 for z in zoom):
        return arr
    # grid_mode=True: pixel-area resampling convention (cv2/skimage-style);
    # nearest boundary replicates edges instead of drooping toward zero
    return ndimage.zoom(arr, zoom, order=order, grid_mode=True, mode="nearest")


def fit_sample(
    arr: np.ndarray,
    shape: Sequence[int],
    mode: str = "crop_pad",
    rescale_intensity: bool = True,
) -> np.ndarray:
    """Fit one sample to the fixed spatial `shape` a jitted step expects.

    mode="crop_pad" center-crops/zero-pads (preserves resolution,
    reference 3D-DDPM tutorial route); mode="resize" interpolates
    (reference 3D-LDM route). Intensity is min-max scaled to [0, 1]
    first unless disabled.
    """
    arr = np.asarray(arr, np.float32)
    if rescale_intensity:
        arr = scale_intensity(arr)
    if mode == "crop_pad":
        return center_crop_or_pad(arr, shape)
    if mode == "resize":
        return resize(arr, shape)
    raise ValueError(f"unknown fit mode {mode!r}; use 'crop_pad' or 'resize'")


def fitted_stream(source, shape: Sequence[int], mode: str = "crop_pad"):
    """Map `fit_sample` over an iterator of samples; mode="none" passes
    through untouched (samples must already match the target shape)."""
    if mode == "none":
        return iter(source)
    return (fit_sample(a, shape, mode=mode) for a in source)
