"""Feature-extractor backbones for perceptual losses (channels-last flax).

These are TPU-native re-implementations of the pretrained feature networks
the reference reaches through lpips / torchvision / torch.hub
(generative/losses/perceptual.py:90,167,231,302): AlexNet, VGG16 and
SqueezeNet1.1 features (LPIPS taps), 2D ResNet50 (RadImageNet/torchvision
backends) and 3D ResNet10/50 (MedicalNet backend). Weights convert from
torch state dicts via `convert_torch_state_dict` — this image has no
network egress, so pretrained checkpoints must be supplied as local files.
"""
from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


def _max_pool(x, window, stride, ceil_mode=False, padding=0):
    if padding or ceil_mode:
        pads = [(0, 0)]
        for s in x.shape[1:-1]:
            lo = hi = padding
            if ceil_mode:
                # torch ceil_mode: pad high edge so the last partial window counts
                padded = s + 2 * padding
                out = -(-(padded - window) // stride) + 1
                hi += max(0, (out - 1) * stride + window - padded)
            pads.append((lo, hi))
        pads.append((0, 0))
        x = jnp.pad(x, pads, constant_values=-jnp.inf)
    n = x.ndim - 2
    dims = (1,) + (window,) * n + (1,)
    strides = (1,) + (stride,) * n + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features`, returning the 5 LPIPS tap activations."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), (s, s), [(p, p), (p, p)], dtype=self.dtype, name=name
        )
        taps = []
        h = nn.relu(conv(64, 11, 4, 2, "conv1")(x))
        taps.append(h)
        h = _max_pool(h, 3, 2)
        h = nn.relu(conv(192, 5, 1, 2, "conv2")(h))
        taps.append(h)
        h = _max_pool(h, 3, 2)
        h = nn.relu(conv(384, 3, 1, 1, "conv3")(h))
        taps.append(h)
        h = nn.relu(conv(256, 3, 1, 1, "conv4")(h))
        taps.append(h)
        h = nn.relu(conv(256, 3, 1, 1, "conv5")(h))
        taps.append(h)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16 `.features`, returning the 5 LPIPS tap activations."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        h = x
        idx = 0
        for block, (features, reps) in enumerate(cfg):
            for r in range(reps):
                h = nn.relu(
                    nn.Conv(
                        features, (3, 3), (1, 1), [(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"conv{idx}",
                    )(h)
                )
                idx += 1
            taps.append(h)
            if block < len(cfg) - 1:
                h = _max_pool(h, 2, 2)
        return taps


class _Fire(nn.Module):
    squeeze: int
    expand: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), dtype=self.dtype, name="expand1x1")(s))
        e3 = nn.relu(
            nn.Conv(self.expand, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="expand3x3")(s)
        )
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision SqueezeNet1.1 `.features`, returning the 7 LPIPS taps."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        h = nn.relu(nn.Conv(64, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="conv1")(x))
        taps.append(h)
        h = _max_pool(h, 3, 2, ceil_mode=True)
        h = _Fire(16, 64, dtype=self.dtype, name="fire2")(h)
        h = _Fire(16, 64, dtype=self.dtype, name="fire3")(h)
        taps.append(h)
        h = _max_pool(h, 3, 2, ceil_mode=True)
        h = _Fire(32, 128, dtype=self.dtype, name="fire4")(h)
        h = _Fire(32, 128, dtype=self.dtype, name="fire5")(h)
        taps.append(h)
        h = _max_pool(h, 3, 2, ceil_mode=True)
        h = _Fire(48, 192, dtype=self.dtype, name="fire6")(h)
        taps.append(h)
        h = _Fire(48, 192, dtype=self.dtype, name="fire7")(h)
        taps.append(h)
        h = _Fire(64, 256, dtype=self.dtype, name="fire8")(h)
        taps.append(h)
        h = _Fire(64, 256, dtype=self.dtype, name="fire9")(h)
        taps.append(h)
        return taps


class _Bottleneck(nn.Module):
    features: int
    stride: int = 1
    spatial_dims: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, use_running_average=True):
        n = self.spatial_dims
        k1 = (1,) * n
        k3 = (3,) * n
        conv = lambda f, k, s, name: nn.Conv(
            f, k, (s,) * n, [((kk - 1) // 2, (kk - 1) // 2) for kk in k],
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        h = nn.relu(bn("bn1")(conv(self.features, k1, 1, "conv1")(x)))
        h = nn.relu(bn("bn2")(conv(self.features, k3, self.stride, "conv2")(h)))
        h = bn("bn3")(conv(self.features * 4, k1, 1, "conv3")(h))
        if identity.shape[-1] != self.features * 4 or self.stride != 1:
            identity = bn("bn_down")(
                conv(self.features * 4, k1, self.stride, "conv_down")(x)
            )
        return nn.relu(h + identity)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    spatial_dims: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, use_running_average=True):
        n = self.spatial_dims
        k3 = (3,) * n
        conv = lambda f, s, name: nn.Conv(
            f, k3, (s,) * n, [(1, 1)] * n, use_bias=False, dtype=self.dtype, name=name
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        h = nn.relu(bn("bn1")(conv(self.features, self.stride, "conv1")(x)))
        h = bn("bn2")(conv(self.features, 1, "conv2")(h))
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = bn("bn_down")(
                nn.Conv(
                    self.features, (1,) * n, (self.stride,) * n, use_bias=False,
                    dtype=self.dtype, name="conv_down",
                )(x)
            )
        return nn.relu(h + identity)


class ResNetFeatures(nn.Module):
    """ResNet feature trunk (2D ResNet50 or 3D MedicalNet-style ResNet10/50).

    Returns the final stage (layer4) activation, the feature map the
    reference perceptual backends use (perceptual.py:310-311).
    """

    spatial_dims: int = 2
    block: str = "bottleneck"  # "bottleneck" | "basic"
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        n = self.spatial_dims
        h = nn.Conv(
            64, (7,) * n, (2,) * n, [(3, 3)] * n, use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        h = nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(h)
        h = nn.relu(h)
        h = _max_pool(h, 3, 2, padding=1)  # torch MaxPool(3, 2, padding=1)

        block_cls = _Bottleneck if self.block == "bottleneck" else _BasicBlock
        features = 64
        for stage, reps in enumerate(self.layers):
            for r in range(reps):
                stride = 2 if (stage > 0 and r == 0) else 1
                h = block_cls(
                    features, stride, spatial_dims=n, dtype=self.dtype,
                    name=f"layer{stage + 1}_{r}",
                )(h, use_running_average=use_running_average)
            features *= 2
        return h


def convert_torch_state_dict(state_dict: dict, name_map: dict[str, str]) -> dict:
    """Convert a torch conv/linear state dict into flax param arrays.

    Args:
        state_dict: torch state dict (tensors or numpy arrays).
        name_map: mapping from torch prefix (e.g. "features.0") to a flax
            param path "module/sub" — the weight/bias pair is converted
            (OIHW -> HWIO for convs, (out,in) -> (in,out) for linears).

    Returns:
        nested dict of numpy arrays insertable into a flax params tree.
    """
    out: dict = {}

    def _set(path: str, leaf_name: str, value):
        node = out
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leaf_name] = value

    for torch_prefix, flax_path in name_map.items():
        w = state_dict.get(f"{torch_prefix}.weight")
        b = state_dict.get(f"{torch_prefix}.bias")
        if w is None:
            continue
        w = np.asarray(w)
        if w.ndim >= 3:  # conv OI<spatial> -> <spatial>IO
            w = np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))
            _set(flax_path, "kernel", w)
        elif w.ndim == 2:  # linear (out,in) -> (in,out)
            _set(flax_path, "kernel", w.T)
        else:  # norm scale
            _set(flax_path, "scale", w)
        if b is not None:
            _set(flax_path, "bias", np.asarray(b))
    return out
