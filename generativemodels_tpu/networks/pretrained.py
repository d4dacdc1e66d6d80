"""Pretrained-weight plumbing for the perceptual backbones.

The reference reaches pretrained feature networks through lpips /
torchvision / torch.hub downloads (generative/losses/perceptual.py:90,
167,231,302). This image has no egress, so the drop-in procedure is:

1. obtain the torch checkpoint elsewhere (e.g. `torchvision.models.
   alexnet(weights=...).state_dict()`, the lpips package's `lin` head
   checkpoint, MedicalNet's `resnet_10_23dataset.pth`),
2. save it with `torch.save(state_dict, path)` (or `numpy.savez`),
3. pass `pretrained_path=path` to `PerceptualLoss`, or call
   `load_pretrained_perceptual(network_type, path)` and hand the result
   to `PerceptualLoss(params=..., batch_stats=..., lin_weights=...)`.

The per-backbone NAME_MAPS below translate the torch module names of the
original checkpoints into this package's flax param paths; conversion
itself (OIHW->HWIO etc.) is `backbones.convert_torch_state_dict`.
A weights-file-gated golden test (tests/test_perceptual.py) validates
LPIPS numerics automatically once weight files are present.
"""
from __future__ import annotations

import os

import numpy as np


def _vgg16_name_map() -> dict[str, str]:
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    return {f"features.{t}": f"conv{i}" for i, t in enumerate(torch_idx)}


def _squeezenet_name_map() -> dict[str, str]:
    # torchvision squeezenet1_1 .features Fire indices 3,4,6,7,9,10,11,12
    m = {"features.0": "conv1"}
    for fire, idx in enumerate([3, 4, 6, 7, 9, 10, 11, 12], start=2):
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            m[f"features.{idx}.{sub}"] = f"fire{fire}/{sub}"
    return m


def _resnet_name_map(layers: tuple[int, ...], blocks_have_bn3: bool) -> dict[str, str]:
    m = {"conv1": "conv1", "bn1": "bn1"}
    n_convs = 3 if blocks_have_bn3 else 2
    for stage, reps in enumerate(layers, start=1):
        for r in range(reps):
            for k in range(1, n_convs + 1):
                m[f"layer{stage}.{r}.conv{k}"] = f"layer{stage}_{r}/conv{k}"
                m[f"layer{stage}.{r}.bn{k}"] = f"layer{stage}_{r}/bn{k}"
            m[f"layer{stage}.{r}.downsample.0"] = f"layer{stage}_{r}/conv_down"
            m[f"layer{stage}.{r}.downsample.1"] = f"layer{stage}_{r}/bn_down"
    return m


#: torch checkpoint module names -> flax param paths, per backbone
NAME_MAPS: dict[str, dict[str, str]] = {
    # torchvision alexnet .features conv indices 0,3,6,8,10 (LPIPS taps)
    "alex": {
        "features.0": "conv1",
        "features.3": "conv2",
        "features.6": "conv3",
        "features.8": "conv4",
        "features.10": "conv5",
    },
    "vgg": _vgg16_name_map(),
    "squeeze": _squeezenet_name_map(),
    # torchvision / RadImageNet ResNet50 (bottleneck, layers 3-4-6-3)
    "resnet50": _resnet_name_map((3, 4, 6, 3), blocks_have_bn3=True),
    "radimagenet_resnet50": _resnet_name_map((3, 4, 6, 3), blocks_have_bn3=True),
    # MedicalNet 3D ResNets (basic blocks for resnet10)
    "medicalnet_resnet10_23datasets": _resnet_name_map((1, 1, 1, 1), blocks_have_bn3=False),
    "medicalnet_resnet50_23datasets": _resnet_name_map((3, 4, 6, 3), blocks_have_bn3=True),
}
# aliases used by _ResNetBackend
NAME_MAPS["medicalnet_resnet10"] = NAME_MAPS["medicalnet_resnet10_23datasets"]
NAME_MAPS["medicalnet_resnet50"] = NAME_MAPS["medicalnet_resnet50_23datasets"]
NAME_MAPS["torchvision"] = NAME_MAPS["resnet50"]
NAME_MAPS["radimagenet"] = NAME_MAPS["radimagenet_resnet50"]


def strip_prefixes(state_dict: dict) -> dict:
    """Drop DataParallel / hub wrappers: 'module.' (MedicalNet) and 'net.' (lpips)."""
    out = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "net."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def convert_backbone_state_dict(state_dict: dict, network_type: str):
    """Torch checkpoint -> (params, batch_stats) flax trees for a backbone.

    Handles conv/linear transposition via `convert_torch_state_dict` and
    routes BatchNorm running statistics into the batch_stats collection.
    """
    from .backbones import convert_torch_state_dict

    if network_type not in NAME_MAPS:
        raise ValueError(
            f"no NAME_MAP for {network_type!r}; known: {sorted(NAME_MAPS)}"
        )
    name_map = NAME_MAPS[network_type]
    state_dict = strip_prefixes(state_dict)
    params = convert_torch_state_dict(state_dict, name_map)

    batch_stats: dict = {}

    def _set(tree, path, leaf, value):
        node = tree
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leaf] = np.asarray(value)

    for torch_prefix, flax_path in name_map.items():
        mean = state_dict.get(f"{torch_prefix}.running_mean")
        var = state_dict.get(f"{torch_prefix}.running_var")
        if mean is not None:
            _set(batch_stats, flax_path, "mean", mean)
        if var is not None:
            _set(batch_stats, flax_path, "var", var)
    return params, batch_stats


def load_lpips_lin_weights(state_dict: dict) -> list[np.ndarray]:
    """Extract LPIPS' learned per-layer channel weights.

    lpips checkpoints store them as `lin{i}.model.1.weight` with shape
    (1, C_i, 1, 1) (1x1 convs); returns a list of (C_i,) arrays ordered by
    layer index — the form `PerceptualLoss(lin_weights=...)` consumes.
    """
    state_dict = strip_prefixes(state_dict)
    weights = []
    i = 0
    while True:
        w = state_dict.get(f"lin{i}.model.1.weight")
        if w is None:
            w = state_dict.get(f"lins.{i}.model.1.weight")
        if w is None:
            break
        weights.append(np.asarray(w).reshape(-1))
        i += 1
    if not weights:
        raise ValueError("no lin{i}.model.1.weight entries found in state dict")
    return weights


def _load_state_dict(path: str, state_dict_key: str | None = None) -> dict:
    """Load a torch .pt/.pth checkpoint or a numpy .npz into a flat dict.

    `state_dict_key` selects a sub-dict of the checkpoint before
    conversion (reference: generative/losses/perceptual.py:307
    `pretrained_state_dict_key`); when None, a "state_dict" wrapper is
    unwrapped automatically (MedicalNet's layout).
    """
    if path.endswith(".npz"):
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if state_dict_key is not None:
        obj = obj[state_dict_key]
    elif isinstance(obj, dict) and "state_dict" in obj:  # MedicalNet wraps it
        obj = obj["state_dict"]
    return {k: np.asarray(v) for k, v in obj.items()}


def load_pretrained_perceptual(
    network_type: str,
    backbone_path: str,
    lin_path: str | None = None,
    state_dict_key: str | None = None,
) -> dict:
    """Load + convert pretrained weights for `PerceptualLoss`.

    Returns a kwargs dict: {"params", "batch_stats", "lin_weights"} —
    splat into `PerceptualLoss(..., **loaded)`.
    """
    params, batch_stats = convert_backbone_state_dict(
        _load_state_dict(backbone_path, state_dict_key), network_type
    )
    lin_weights = None
    if lin_path is not None and os.path.exists(lin_path):
        lin_weights = load_lpips_lin_weights(_load_state_dict(lin_path))
    return {"params": params, "batch_stats": batch_stats, "lin_weights": lin_weights}
