"""Import the PyTorch reference (read-only at /root/reference) for golden tests.

MONAI core is not installed in this image; the reference only needs a small
set of symbols from it (StrEnum, optional_import, Convolution/ADN/MLPBlock,
the Act/Pool factories, ensure_tuple_rep), so we install a minimal stub into
sys.modules before importing `generative`. The stubs reproduce real MONAI's
*module tree* exactly — `Convolution` is an nn.Sequential with a "conv"
child (+ "adn" when not conv_only), ADN children are named "A"/"D"/"N",
`MLPBlock` owns linear1/linear2 — so the state_dict KEYS these models emit
are bit-identical to what published model-zoo checkpoints contain. That key
fidelity is what `generativemodels_tpu/networks/zoo_convert.py` is tested
against (tests/test_zoo_convert.py).

All installers are idempotent getattr-or-create so the loaders compose in
any order within one process.
"""
from __future__ import annotations

import sys
import types
from enum import Enum

REFERENCE_PATH = "/root/reference"


def _ensure_module(name: str) -> types.ModuleType:
    """Return sys.modules[name], creating it (and wiring the parent attr)."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if "." in name:
            parent_name, _, child = name.rpartition(".")
            setattr(_ensure_module(parent_name), child, mod)
    return mod


def _install_monai_stub() -> None:
    if "monai" in sys.modules and hasattr(sys.modules.get("monai.utils", None), "StrEnum"):
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

    _ensure_module("monai")
    monai_utils = _ensure_module("monai.utils")
    monai_utils.StrEnum = StrEnum
    monai_utils.optional_import = optional_import
    monai_utils.min_version = min_version
    monai_config = _ensure_module("monai.config")

    class IgniteInfo:
        OPT_IMPORT_VERSION = "0.4.4"

    monai_config.IgniteInfo = IgniteInfo

    utils_enums = _ensure_module("monai.utils.enums")
    utils_enums.StrEnum = StrEnum


def _get_act_layer(name):
    """monai.networks.layers.utils.get_act_layer for the acts the reference uses."""
    import torch

    if isinstance(name, (tuple, list)):
        kind, kwargs = name
    else:
        kind, kwargs = name, {}
    kind = str(kind).upper()
    table = {
        "SIGMOID": torch.nn.Sigmoid,
        "TANH": torch.nn.Tanh,
        "RELU": torch.nn.ReLU,
        "LEAKYRELU": torch.nn.LeakyReLU,
        "PRELU": torch.nn.PReLU,
        "GELU": torch.nn.GELU,
        "SILU": torch.nn.SiLU,
        "SWISH": torch.nn.SiLU,
    }
    if kind not in table:
        raise ValueError(f"act stub does not know {kind!r}")
    return table[kind](**kwargs)


def _get_norm_layer(name, spatial_dims: int, channels: int):
    import torch

    if isinstance(name, (tuple, list)):
        kind, kwargs = name
    else:
        kind, kwargs = name, {}
    kind = str(kind).upper()
    if kind == "INSTANCE":
        cls = (torch.nn.InstanceNorm1d, torch.nn.InstanceNorm2d, torch.nn.InstanceNorm3d)[
            spatial_dims - 1
        ]
        return cls(channels, **kwargs)
    if kind == "BATCH":
        cls = (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)[
            spatial_dims - 1
        ]
        return cls(channels, **kwargs)
    if kind == "GROUP":
        return torch.nn.GroupNorm(num_channels=channels, **kwargs)
    raise ValueError(f"norm stub does not know {kind!r}")


def _install_monai_networks_stub() -> None:
    """Install Convolution/ADN/MLPBlock/Act/Pool/get_pool_layer stubs.

    Module tree and child names mirror real MONAI so reference state_dict
    keys match published checkpoints (see module docstring).
    """
    _install_monai_stub()
    import torch
    from torch import nn

    blocks = _ensure_module("monai.networks.blocks")
    if getattr(blocks, "_gmtpu_installed", False):
        return

    class ADN(nn.Sequential):
        # real MONAI: monai/networks/blocks/acti_norm.py — children are
        # added per `ordering` letter with the LETTER as the module name.
        def __init__(self, ordering="NDA", in_channels=None, act="RELU",
                     norm=None, norm_dim=None, dropout=None, dropout_dim=1):
            super().__init__()
            ops = {
                "A": (lambda: _get_act_layer(act)) if act is not None else None,
                "D": (lambda: nn.Dropout(dropout)) if dropout is not None else None,
                "N": (lambda: _get_norm_layer(norm, norm_dim, in_channels))
                if norm is not None
                else None,
            }
            for item in ordering.upper():
                if ops.get(item) is not None:
                    self.add_module(item, ops[item]())

    class Convolution(nn.Sequential):
        # real MONAI: monai/networks/blocks/convolutions.py — child "conv"
        # (+ "adn" unless conv_only or all of act/norm/dropout are None).
        def __init__(self, spatial_dims, in_channels, out_channels,
                     strides=1, kernel_size=3, adn_ordering="NDA",
                     act="PRELU", norm="INSTANCE", dropout=None,
                     dropout_dim=1, dilation=1, groups=1, bias=True,
                     conv_only=False, is_transposed=False, padding=None,
                     output_padding=None):
            super().__init__()
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
            if conv_only:
                return
            if act is None and norm is None and dropout is None:
                return
            self.add_module(
                "adn",
                ADN(ordering=adn_ordering, in_channels=out_channels, act=act,
                    norm=norm, norm_dim=spatial_dims, dropout=dropout,
                    dropout_dim=dropout_dim),
            )

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

    class Act:
        RELU = "RELU"
        LEAKYRELU = "LEAKYRELU"
        PRELU = "PRELU"
        TANH = "TANH"
        SIGMOID = "SIGMOID"

        def __class_getitem__(cls, item):
            if isinstance(item, (tuple, list)):
                kind, kwargs = item
                return lambda: _get_act_layer((kind, kwargs))
            return lambda **kw: _get_act_layer((item, kw))

    class Pool:
        AVG = "avg"

        def __class_getitem__(cls, item):
            kind, spatial_dims = item
            assert str(kind).lower() == cls.AVG
            return (nn.AvgPool1d, nn.AvgPool2d, nn.AvgPool3d)[spatial_dims - 1]

    def get_pool_layer(name, spatial_dims=1):
        if isinstance(name, (tuple, list)):
            kind, kwargs = name
        else:
            kind, kwargs = name, {}
        return Pool[kind, spatial_dims](**kwargs)

    def ensure_tuple_rep(val, dim):
        if isinstance(val, (tuple, list)):
            if len(val) != dim:
                raise ValueError(f"length {len(val)} != {dim}")
            return tuple(val)
        return (val,) * dim

    blocks.Convolution = Convolution
    blocks.ADN = ADN
    blocks.MLPBlock = MLPBlock
    blocks._gmtpu_installed = True
    blocks_mlp = _ensure_module("monai.networks.blocks.mlp")
    blocks_mlp.MLPBlock = MLPBlock
    blocks_convs = _ensure_module("monai.networks.blocks.convolutions")
    blocks_convs.Convolution = Convolution

    layers = _ensure_module("monai.networks.layers")
    layers.Act = Act
    layers.get_pool_layer = get_pool_layer
    factories = _ensure_module("monai.networks.layers.factories")
    factories.Pool = Pool
    factories.Act = Act
    layers_utils = _ensure_module("monai.networks.layers.utils")
    if not hasattr(layers_utils, "get_act_layer"):
        layers_utils.get_act_layer = _get_act_layer

    monai_utils = sys.modules["monai.utils"]
    monai_utils.ensure_tuple_rep = ensure_tuple_rep
    utils_misc = _ensure_module("monai.utils.misc")
    utils_misc.ensure_tuple_rep = ensure_tuple_rep


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
    try:
        import torch  # noqa: F401

        layers_utils = _ensure_module("monai.networks.layers.utils")
        if not hasattr(layers_utils, "get_act_layer"):
            layers_utils.get_act_layer = _get_act_layer
        _ensure_module("monai.networks.layers")
        _ensure_module("monai.networks")

        class LossReduction(str, Enum):
            NONE = "none"
            MEAN = "mean"
            SUM = "sum"

            def __str__(self):
                return self.value

        sys.modules["monai.utils"].LossReduction = LossReduction

        # generative.losses.__init__ pulls in perceptual.py, which needs
        # lpips/torchvision (absent here) — stub just enough to import.
        lpips_mod = types.ModuleType("lpips")
        lpips_mod.LPIPS = type("LPIPS", (), {})
        sys.modules.setdefault("lpips", lpips_mod)
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_fx = types.ModuleType("torchvision.models.feature_extraction")
        tv_models.ResNet50_Weights = type("ResNet50_Weights", (), {})
        tv_models.resnet50 = lambda *a, **k: None
        tv_fx.create_feature_extractor = lambda *a, **k: None
        tv.models = tv_models
        tv_models.feature_extraction = tv_fx
        sys.modules.setdefault("torchvision", tv)
        sys.modules.setdefault("torchvision.models", tv_models)
        sys.modules.setdefault("torchvision.models.feature_extraction", tv_fx)

        if REFERENCE_PATH not in sys.path:
            sys.path.insert(0, REFERENCE_PATH)
        import generative.losses.adversarial_loss as ref_adv

        return ref_adv
    except Exception:
        return None


def _register_reference_subpackages() -> None:
    """Register generative.networks.{nets,blocks,layers} as import roots
    WITHOUT executing their __init__ (the real nets/__init__ imports every
    net eagerly; pointing __path__ at the reference directory lets each
    leaf module import on demand instead)."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import generative.networks  # real, benign __init__s

    for sub in ("nets", "blocks", "layers"):
        name = f"generative.networks.{sub}"
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [f"{REFERENCE_PATH}/generative/networks/{sub}"]
            sys.modules[name] = pkg
            setattr(generative.networks, sub, pkg)


def load_reference_nets():
    """Returns a namespace with every reference net class, or None.

    Uses the full MONAI stub + lazy subpackage registration so ALL of
    generative/networks/nets imports: DiffusionModelUNet,
    DiffusionModelEncoder, AutoencoderKL, VQVAE, ControlNet,
    DecoderOnlyTransformer, PatchDiscriminator,
    MultiScalePatchDiscriminator and the SPADE family. State-dict keys
    match published model-zoo checkpoints (see module docstring);
    tests/test_zoo_convert.py golden-tests
    generativemodels_tpu/networks/zoo_convert.py against them.
    """
    _install_monai_networks_stub()
    try:
        _register_reference_subpackages()
        import generative.networks.nets.autoencoderkl as aekl
        import generative.networks.nets.controlnet as cn
        import generative.networks.nets.diffusion_model_unet as dmu
        import generative.networks.nets.patchgan_discriminator as pg
        import generative.networks.nets.spade_autoencoderkl as sa
        import generative.networks.nets.spade_diffusion_model_unet as sd
        import generative.networks.nets.spade_network as sn
        import generative.networks.nets.transformer as tr
        import generative.networks.nets.vqvae as vq

        ns = types.SimpleNamespace()
        ns.DiffusionModelUNet = dmu.DiffusionModelUNet
        ns.DiffusionModelEncoder = dmu.DiffusionModelEncoder
        ns.diffusion_model_unet = dmu
        ns.AutoencoderKL = aekl.AutoencoderKL
        ns.autoencoderkl = aekl
        ns.ControlNet = cn.ControlNet
        ns.copy_weights_to_controlnet = cn.copy_weights_to_controlnet
        ns.VQVAE = vq.VQVAE
        ns.DecoderOnlyTransformer = tr.DecoderOnlyTransformer
        ns.PatchDiscriminator = pg.PatchDiscriminator
        ns.MultiScalePatchDiscriminator = pg.MultiScalePatchDiscriminator
        ns.SPADEAutoencoderKL = sa.SPADEAutoencoderKL
        ns.SPADEDiffusionModelUNet = sd.SPADEDiffusionModelUNet
        ns.SPADENet = sn.SPADENet
        return ns
    except Exception:
        return None


def load_reference_inferers():
    """Returns the reference `generative.inferers.inferer` module, or None.

    Extends the nets loader with the three monai pieces inferer.py imports
    (inferer.py:21-23): `decollate_batch` (unbind over batch),
    `Inferer` (abstract base), and functional `CenterSpatialCrop` /
    `SpatialPad` (the latent-shape resizers, applied per-sample on
    (C, *spatial) tensors)."""
    ns = load_reference_nets()
    if ns is None:
        return None
    try:
        import torch

        nets_pkg = sys.modules["generative.networks.nets"]
        nets_pkg.VQVAE = ns.VQVAE
        nets_pkg.SPADEAutoencoderKL = ns.SPADEAutoencoderKL
        nets_pkg.SPADEDiffusionModelUNet = ns.SPADEDiffusionModelUNet

        monai_data = _ensure_module("monai.data")
        monai_data.decollate_batch = lambda x: list(torch.unbind(x, 0))

        monai_inferers = _ensure_module("monai.inferers")

        class Inferer:
            def __call__(self, inputs, network, *args, **kwargs):
                raise NotImplementedError

        monai_inferers.Inferer = Inferer

        monai_transforms = _ensure_module("monai.transforms")

        class CenterSpatialCrop:
            def __init__(self, roi_size):
                self.roi_size = list(roi_size)

            def __call__(self, t):
                # t is (C, *spatial); roi entries of -1 keep the dim
                slices = [slice(None)]
                for size, roi in zip(t.shape[1:], self.roi_size):
                    if roi == -1 or roi >= size:
                        slices.append(slice(None))
                    else:
                        start = (size - roi) // 2
                        slices.append(slice(start, start + roi))
                return t[tuple(slices)]

        class SpatialPad:
            def __init__(self, spatial_size):
                self.spatial_size = list(spatial_size)

            def __call__(self, t):
                # symmetric center pad of (C, *spatial) up to spatial_size
                pads = []  # torch.nn.functional.pad order: last dim first
                for size, target in zip(
                    reversed(t.shape[1:]), reversed(self.spatial_size)
                ):
                    extra = max(int(target) - size, 0) if target != -1 else 0
                    pads.extend([extra // 2, extra - extra // 2])
                return torch.nn.functional.pad(t, pads)

        monai_transforms.CenterSpatialCrop = CenterSpatialCrop
        monai_transforms.SpatialPad = SpatialPad

        import generative.inferers.inferer as ref_inf

        return ref_inf
    except Exception:
        return None
