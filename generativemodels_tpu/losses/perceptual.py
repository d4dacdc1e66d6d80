"""Perceptual losses with LPIPS / RadImageNet / MedicalNet / ResNet backends.

Reference parity: generative/losses/perceptual.py:21-366 (PerceptualLoss
with the 2.5D fake-3D slicing scheme; MedicalNet / RadImageNet /
Torchvision backends with channel-normalised feature MSE + spatial
average). The reference downloads pretrained weights via lpips /
torch.hub / torchvision; this image has no network egress, so backends
run with supplied weights (`pretrained_path` -> local torch checkpoint,
converted on load) or — for development only — random initialisation
(`pretrained=False`).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..networks.backbones import (
    AlexNetFeatures,
    ResNetFeatures,
    SqueezeNetFeatures,
    VGG16Features,
)


def normalize_tensor(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Unit-normalise across the channel (last) axis."""
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def spatial_average(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over spatial axes of (B, *spatial, C) -> (B, 1...1, C)."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, axis=axes, keepdims=True)


_LPIPS_NETS = {
    "alex": AlexNetFeatures,
    "vgg": VGG16Features,
    "squeeze": SqueezeNetFeatures,
}

# ImageNet normalisation used by the LPIPS scaling layer. Plain tuples:
# module-level jnp arrays would initialise the backend at import time
# (hanging every `import generativemodels_tpu` when the TPU is unreachable)
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


class _LPIPSBackend:
    """LPIPS-style similarity: multi-layer normalised feature distances.

    Without the learned per-layer linear heads' pretrained weights, the
    distances are averaged over channels (lpips `spatial=False, lin=False`
    behavior); supplying `lin_weights` (list of (C_l,) arrays) reproduces
    the full LPIPS weighting.
    """

    def __init__(self, net: str, params=None, lin_weights=None, key=None):
        self.module = _LPIPS_NETS[net]()
        if params is None:
            dummy = jnp.zeros((1, 64, 64, 3))
            params = self.module.init(key or jax.random.PRNGKey(0), dummy)["params"]
        self.params = params
        self.lin_weights = lin_weights

    def __call__(self, input_cl: jnp.ndarray, target_cl: jnp.ndarray) -> jnp.ndarray:
        # LPIPS input scaling (images in [-1, 1])
        shift = jnp.asarray(_LPIPS_SHIFT)
        scale = jnp.asarray(_LPIPS_SCALE)
        x = (input_cl - shift) / scale
        y = (target_cl - shift) / scale
        feats_x = self.module.apply({"params": self.params}, x)
        feats_y = self.module.apply({"params": self.params}, y)
        total = 0.0
        for i, (fx, fy) in enumerate(zip(feats_x, feats_y)):
            diff = (normalize_tensor(fx) - normalize_tensor(fy)) ** 2
            if self.lin_weights is not None:
                diff = diff * self.lin_weights[i][None, None, None, :]
                total = total + spatial_average(jnp.sum(diff, axis=-1, keepdims=True))
            else:
                total = total + spatial_average(jnp.mean(diff, axis=-1, keepdims=True))
        return total


class _ResNetBackend:
    """Shared logic for RadImageNet / torchvision ResNet50 backends."""

    def __init__(self, mode: str, spatial_dims: int = 2, params=None, batch_stats=None, key=None):
        self.mode = mode  # "radimagenet" | "torchvision" | "medicalnet"
        if mode == "medicalnet_resnet10":
            self.module = ResNetFeatures(spatial_dims=3, block="basic", layers=(1, 1, 1, 1))
            dummy = jnp.zeros((1, 16, 16, 16, 1))
        elif mode == "medicalnet_resnet50":
            self.module = ResNetFeatures(spatial_dims=3, block="bottleneck", layers=(3, 4, 6, 3))
            dummy = jnp.zeros((1, 16, 16, 16, 1))
        else:
            self.module = ResNetFeatures(spatial_dims=2, block="bottleneck", layers=(3, 4, 6, 3))
            dummy = jnp.zeros((1, 64, 64, 3))
        if params is None:
            variables = self.module.init(key or jax.random.PRNGKey(0), dummy)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        self.params = params
        self.batch_stats = batch_stats or {}

    def _features(self, x_cl: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, x_cl,
            use_running_average=True,
        )

    def __call__(self, input_cl: jnp.ndarray, target_cl: jnp.ndarray) -> jnp.ndarray:
        if self.mode in ("radimagenet", "torchvision"):
            if input_cl.shape[-1] == 1:
                input_cl = jnp.repeat(input_cl, 3, axis=-1)
                target_cl = jnp.repeat(target_cl, 3, axis=-1)
            if self.mode == "radimagenet":
                # RGB -> BGR then mean subtraction (reference :249-255)
                input_cl = input_cl[..., ::-1] - jnp.asarray([0.406, 0.456, 0.485])
                target_cl = target_cl[..., ::-1] - jnp.asarray([0.406, 0.456, 0.485])
            else:
                mean = jnp.asarray([0.485, 0.456, 0.406])
                std = jnp.asarray([0.229, 0.224, 0.225])
                input_cl = (input_cl - mean) / std
                target_cl = (target_cl - mean) / std
        else:  # medicalnet: global z-score per batch (reference :210-214)
            input_cl = (input_cl - input_cl.mean()) / input_cl.std()
            target_cl = (target_cl - target_cl.mean()) / target_cl.std()

        fx = normalize_tensor(self._features(input_cl))
        fy = normalize_tensor(self._features(target_cl))
        diff = (fx - fy) ** 2
        return spatial_average(jnp.sum(diff, axis=-1, keepdims=True))


class PerceptualLoss:
    """Feature-space perceptual loss over (B, C, *spatial) images.

    Args:
        spatial_dims: 2 or 3.
        network_type: "alex" | "vgg" | "squeeze" | "radimagenet_resnet50" |
            "medicalnet_resnet10_23datasets" | "medicalnet_resnet50_23datasets"
            | "resnet50".
        is_fake_3d: use the 2.5D slicing approach for 3D inputs.
        fake_3d_ratio: fraction of slices per axis used in the 2.5D pass.
        params / batch_stats / lin_weights: converted pretrained weights
            (see networks.pretrained.load_pretrained_perceptual); random
            init when omitted.
        pretrained_path: torch checkpoint (.pt/.pth or .npz) for the
            backbone — converted on load via the backbone's NAME_MAP.
        lin_path: lpips `lin` head checkpoint for the learned per-layer
            channel weights (LPIPS backends only).
        cache_dir: directory searched for a converted checkpoint named
            `<network_type>.{pt,pth,npz}` when `pretrained_path` is not
            given (reference: generative/losses/perceptual.py:41 sets the
            torch.hub download cache; here — no egress — it is the local
            weight-drop directory).
        pretrained_state_dict_key: key selecting the backbone state dict
            inside the checkpoint at `pretrained_path` (reference:
            generative/losses/perceptual.py:307).
        key: PRNG key for backbone init when no params are given.
        pretrained: reference-API compatibility flag. True (the reference
            default, where it triggers a download) with NO weights supplied
            emits a loud UserWarning because the backbone then runs
            random-init; False or "allow_random" acknowledges random init
            silently. Actual weights always come from
            params/batch_stats/lin_weights or pretrained_path.
    """

    def __init__(
        self,
        spatial_dims: int,
        network_type: str = "alex",
        is_fake_3d: bool = True,
        fake_3d_ratio: float = 0.5,
        pretrained: bool = True,
        params=None,
        batch_stats=None,
        lin_weights=None,
        pretrained_path: str | None = None,
        lin_path: str | None = None,
        cache_dir: str | None = None,
        pretrained_state_dict_key: str | None = None,
        key=None,
    ):
        if spatial_dims not in (2, 3):
            raise NotImplementedError("Perceptual loss is implemented only in 2D and 3D.")
        if (spatial_dims == 2 or is_fake_3d) and "medicalnet_" in network_type:
            raise ValueError(
                "MedicalNet networks are only compatible with spatial_dims=3. "
                "Argument is_fake_3d must be set to False."
            )

        self.spatial_dims = spatial_dims
        self.is_fake_3d = is_fake_3d
        self.fake_3d_ratio = fake_3d_ratio

        if pretrained_path is None and cache_dir is not None:
            # reference-API compat: cache_dir is where downloaded weights
            # land; here it is searched for a dropped-in converted file
            for ext in (".pt", ".pth", ".npz"):
                candidate = os.path.join(cache_dir, network_type + ext)
                if os.path.exists(candidate):
                    pretrained_path = candidate
                    break

        # Reference parity footgun (generative/losses/perceptual.py:90,167):
        # there `pretrained=True` *downloads* real LPIPS / torch.hub weights.
        # This image has no egress, so with no weights supplied the backbone
        # is RANDOM-INIT — silently accepting that would let a 1:1 port
        # train against meaningless features. Warn loudly (or pass
        # pretrained=False / pretrained="allow_random" to acknowledge).
        if (
            pretrained is True
            and pretrained_path is None
            and params is None
            and lin_weights is None
        ):
            import warnings

            warnings.warn(
                "PerceptualLoss(pretrained=True) has no weights to load: no "
                "pretrained_path/params/lin_weights were supplied and this "
                "environment cannot download them. The backbone will run "
                "with RANDOM weights — the loss is NOT a perceptual metric. "
                "Pass pretrained_path=<converted torch checkpoint> (see "
                "networks.pretrained.load_pretrained_perceptual), or set "
                "pretrained=False (or pretrained='allow_random') to "
                "acknowledge random init.",
                UserWarning,
                stacklevel=2,
            )

        if pretrained_path is not None:
            from ..networks.pretrained import load_pretrained_perceptual

            loaded = load_pretrained_perceptual(
                network_type, pretrained_path, lin_path=lin_path,
                state_dict_key=pretrained_state_dict_key,
            )
            params = loaded["params"]
            batch_stats = loaded["batch_stats"]
            lin_weights = loaded["lin_weights"] or lin_weights

        if spatial_dims == 3 and not is_fake_3d:
            kind = "medicalnet_resnet50" if "resnet50" in network_type else "medicalnet_resnet10"
            self.backend = _ResNetBackend(kind, params=params, batch_stats=batch_stats, key=key)
        elif "radimagenet_" in network_type:
            self.backend = _ResNetBackend(
                "radimagenet", params=params, batch_stats=batch_stats, key=key
            )
        elif network_type == "resnet50":
            self.backend = _ResNetBackend(
                "torchvision", params=params, batch_stats=batch_stats, key=key
            )
        elif network_type in _LPIPS_NETS:
            self.backend = _LPIPSBackend(
                network_type, params=params, lin_weights=lin_weights, key=key
            )
        else:
            raise ValueError(f"Unsupported network_type: {network_type}")

    @staticmethod
    def _to_cl(x: jnp.ndarray) -> jnp.ndarray:
        n = x.ndim - 2
        perm = (0,) + tuple(range(2, 2 + n)) + (1,)
        return jnp.transpose(x, perm)

    def _axis_loss(self, input, target, spatial_axis: int, key) -> jnp.ndarray:
        """2.5D: slices along one axis become batch entries (reference :94-128)."""
        preserved = [2, 3, 4]
        preserved.remove(spatial_axis)

        def batchify(x):
            perm = (0, spatial_axis, 1) + tuple(preserved)
            s = jnp.transpose(x, perm)
            return s.reshape(-1, s.shape[2], s.shape[3], s.shape[4])

        input_slices = batchify(input)
        target_slices = batchify(target)
        n_total = input_slices.shape[0]
        n_keep = int(n_total * self.fake_3d_ratio)
        indices = jax.random.permutation(key, n_total)[:n_keep]
        input_slices = jnp.take(input_slices, indices, axis=0)
        target_slices = jnp.take(target_slices, indices, axis=0)
        return jnp.mean(
            self.backend(self._to_cl(input_slices), self._to_cl(target_slices))
        )

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray, key=None) -> jnp.ndarray:
        if target.shape != input.shape:
            raise ValueError(
                f"ground truth has differing shape ({target.shape}) from input ({input.shape})"
            )
        if self.spatial_dims == 3 and self.is_fake_3d:
            if key is None:
                key = jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(key, 3)
            loss = (
                self._axis_loss(input, target, 2, k1)
                + self._axis_loss(input, target, 3, k2)
                + self._axis_loss(input, target, 4, k3)
            )
        else:
            loss = self.backend(self._to_cl(input), self._to_cl(target))
        return jnp.mean(loss)
