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
