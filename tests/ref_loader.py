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
