"""Import the PyTorch reference (read-only at /root/reference) for golden tests.

MONAI core is not installed in this image; the reference only needs a few
trivial symbols from it (StrEnum, IgniteInfo, optional_import, min_version),
so we install a minimal stub into sys.modules before importing `generative`.
Tests that cannot shim their way to a working reference import must skip.
"""
from __future__ import annotations

import sys
import types
from enum import Enum

REFERENCE_PATH = "/root/reference"


def _install_monai_stub() -> None:
    if "monai" in sys.modules:
        return

    class StrEnum(str, Enum):
        def __str__(self):
            return self.value

        def __repr__(self):
            return self.value

    def optional_import(module, version="", version_checker=None, name="", *args, **kwargs):
        try:
            mod = __import__(module, fromlist=[name] if name else [])
            if name:
                mod = getattr(mod, name)
            return mod, True
        except Exception:
            # must be subclassable (e.g. EventEnum base in generative.utils.enums)
            class _MissingEnum(Enum):
                pass

            return _MissingEnum, False

    def min_version(*args, **kwargs):
        return True

    monai = types.ModuleType("monai")
    monai_utils = types.ModuleType("monai.utils")
    monai_utils.StrEnum = StrEnum
    monai_utils.optional_import = optional_import
    monai_utils.min_version = min_version
    monai_config = types.ModuleType("monai.config")

    class IgniteInfo:
        OPT_IMPORT_VERSION = "0.4.4"

    monai_config.IgniteInfo = IgniteInfo
    monai.utils = monai_utils
    monai.config = monai_config
    sys.modules["monai"] = monai
    sys.modules["monai.utils"] = monai_utils
    sys.modules["monai.config"] = monai_config


def load_reference_schedulers():
    """Returns the reference `generative.networks.schedulers` module or None."""
    _install_monai_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import generative.networks.schedulers as ref_schedulers

        return ref_schedulers
    except Exception:
        return None


def load_reference_losses():
    """Returns the reference `generative.losses.adversarial_loss` module or None."""
    _install_monai_stub()
    import sys as _sys

    try:
        import torch

        monai = _sys.modules["monai"]
        layers_utils = types.ModuleType("monai.networks.layers.utils")

        def get_act_layer(name):
            if isinstance(name, tuple):
                kind, kwargs = name
            else:
                kind, kwargs = name, {}
            kind = kind.upper()
            if kind == "SIGMOID":
                return torch.nn.Sigmoid()
            if kind == "TANH":
                return torch.nn.Tanh()
            if kind == "LEAKYRELU":
                return torch.nn.LeakyReLU(**kwargs)
            raise ValueError(kind)

        layers_utils.get_act_layer = get_act_layer
        networks = types.ModuleType("monai.networks")
        layers = types.ModuleType("monai.networks.layers")
        networks.layers = layers
        layers.utils = layers_utils
        monai.networks = networks
        _sys.modules["monai.networks"] = networks
        _sys.modules["monai.networks.layers"] = layers
        _sys.modules["monai.networks.layers.utils"] = layers_utils

        class LossReduction(str, Enum):
            NONE = "none"
            MEAN = "mean"
            SUM = "sum"

            def __str__(self):
                return self.value

        _sys.modules["monai.utils"].LossReduction = LossReduction
        _sys.modules["monai"].utils.LossReduction = LossReduction
        utils_enums = types.ModuleType("monai.utils.enums")
        utils_enums.StrEnum = _sys.modules["monai.utils"].StrEnum
        _sys.modules["monai.utils"].enums = utils_enums
        _sys.modules["monai.utils.enums"] = utils_enums

        # generative.losses.__init__ pulls in perceptual.py, which needs
        # lpips/torchvision (absent here) — stub just enough to import.
        lpips_mod = types.ModuleType("lpips")
        lpips_mod.LPIPS = type("LPIPS", (), {})
        _sys.modules.setdefault("lpips", lpips_mod)
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_fx = types.ModuleType("torchvision.models.feature_extraction")
        tv_models.ResNet50_Weights = type("ResNet50_Weights", (), {})
        tv_models.resnet50 = lambda *a, **k: None
        tv_fx.create_feature_extractor = lambda *a, **k: None
        tv.models = tv_models
        tv_models.feature_extraction = tv_fx
        _sys.modules.setdefault("torchvision", tv)
        _sys.modules.setdefault("torchvision.models", tv_models)
        _sys.modules.setdefault("torchvision.models.feature_extraction", tv_fx)

        if REFERENCE_PATH not in _sys.path:
            _sys.path.insert(0, REFERENCE_PATH)
        import generative.losses.adversarial_loss as ref_adv

        return ref_adv
    except Exception:
        return None


def load_reference_nets():
    """Returns the reference `generative.networks.nets` module or None.

    The reference nets import three real-MONAI blocks
    (diffusion_model_unet.py:40-42, autoencoderkl.py:21-22). The stubs
    below reproduce real MONAI's *module tree* exactly — `Convolution`
    is an nn.Sequential with a "conv" child, `MLPBlock` owns
    linear1/linear2 — so the state_dict KEYS these models emit are
    bit-identical to what published model-zoo checkpoints contain.
    That key fidelity is what `networks/zoo_convert.py` is tested
    against.
    """
    _install_monai_stub()
    import sys as _sys

    try:
        import torch
        from torch import nn

        monai = _sys.modules["monai"]

        class Convolution(nn.Sequential):
            # real MONAI: monai/networks/blocks/convolutions.py — adds the
            # raw conv as child "conv"; conv_only=True (the only mode the
            # reference uses) skips the ADN block entirely.
            def __init__(self, spatial_dims, in_channels, out_channels,
                         strides=1, kernel_size=3, adn_ordering="NDA",
                         act="PRELU", norm="INSTANCE", dropout=None,
                         dropout_dim=1, dilation=1, groups=1, bias=True,
                         conv_only=False, is_transposed=False, padding=None,
                         output_padding=None):
                super().__init__()
                assert conv_only, "stub supports the reference's conv_only mode"
                if padding is None:
                    padding = (kernel_size - 1) // 2 * dilation
                if is_transposed:
                    if output_padding is None:
                        output_padding = strides - 1
                    conv_type = (nn.ConvTranspose1d, nn.ConvTranspose2d,
                                 nn.ConvTranspose3d)[spatial_dims - 1]
                    conv = conv_type(in_channels, out_channels,
                                     kernel_size=kernel_size, stride=strides,
                                     padding=padding,
                                     output_padding=output_padding,
                                     groups=groups, bias=bias,
                                     dilation=dilation)
                else:
                    conv_type = (nn.Conv1d, nn.Conv2d, nn.Conv3d)[spatial_dims - 1]
                    conv = conv_type(in_channels, out_channels,
                                     kernel_size=kernel_size, stride=strides,
                                     padding=padding, dilation=dilation,
                                     groups=groups, bias=bias)
                self.add_module("conv", conv)

        class _GEGLU(nn.Module):
            # real MONAI: x, gate = chunk(2, -1); x * gelu(gate)
            def forward(self, x):
                x, gate = x.chunk(2, dim=-1)
                return x * torch.nn.functional.gelu(gate)

        class MLPBlock(nn.Module):
            # real MONAI: monai/networks/blocks/mlp.py — linear1/linear2
            # children; GEGLU doubles linear1's output width.
            def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0,
                         act="GELU", dropout_mode="vit"):
                super().__init__()
                mlp_dim = mlp_dim or hidden_size * 4
                self.linear1 = nn.Linear(
                    hidden_size, mlp_dim * 2 if act == "GEGLU" else mlp_dim)
                self.linear2 = nn.Linear(mlp_dim, hidden_size)
                self.fn = _GEGLU() if act == "GEGLU" else nn.GELU()
                self.drop1 = nn.Dropout(dropout_rate)
                self.drop2 = nn.Dropout(dropout_rate)

            def forward(self, x):
                return self.drop2(self.linear2(self.drop1(self.fn(self.linear1(x)))))

        class Pool:
            AVG = "avg"

            def __class_getitem__(cls, item):
                kind, spatial_dims = item
                assert kind == cls.AVG
                return (nn.AvgPool1d, nn.AvgPool2d, nn.AvgPool3d)[spatial_dims - 1]

        def ensure_tuple_rep(val, dim):
            if isinstance(val, (tuple, list)):
                if len(val) != dim:
                    raise ValueError(f"length {len(val)} != {dim}")
                return tuple(val)
            return (val,) * dim

        blocks = types.ModuleType("monai.networks.blocks")
        blocks.Convolution = Convolution
        blocks.MLPBlock = MLPBlock
        networks = getattr(monai, "networks", None) or types.ModuleType("monai.networks")
        layers = getattr(networks, "layers", None) or types.ModuleType("monai.networks.layers")
        factories = types.ModuleType("monai.networks.layers.factories")
        factories.Pool = Pool
        layers.factories = factories
        networks.layers = layers
        networks.blocks = blocks
        monai.networks = networks
        _sys.modules["monai.networks"] = networks
        _sys.modules["monai.networks.blocks"] = blocks
        _sys.modules["monai.networks.layers"] = layers
        _sys.modules["monai.networks.layers.factories"] = factories
        _sys.modules["monai.utils"].ensure_tuple_rep = ensure_tuple_rep
        monai.utils.ensure_tuple_rep = ensure_tuple_rep

        # diffusion_model_unet.py and autoencoderkl.py are self-contained
        # (no generative.* imports), so load them by file path — the
        # package __init__ would drag in patchgan/spade/vqvae, which need
        # the full ADN/Act factory machinery we don't stub.
        import importlib.util

        def _load(fname):
            path = f"{REFERENCE_PATH}/generative/networks/nets/{fname}.py"
            spec = importlib.util.spec_from_file_location(f"_ref_{fname}", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod

        ns = types.SimpleNamespace()
        ns.DiffusionModelUNet = _load("diffusion_model_unet").DiffusionModelUNet
        ns.AutoencoderKL = _load("autoencoderkl").AutoencoderKL
        return ns
    except Exception:
        return None
