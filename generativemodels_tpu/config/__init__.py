import os

from .parser import ConfigParser

PRESET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "presets")


def load_preset(name: str) -> ConfigParser:
    """Load a named preset config (e.g. "mednist_ddpm", "brain_3d_ldm")."""
    path = os.path.join(PRESET_DIR, f"{name}.yaml")
    if not os.path.exists(path):
        available = sorted(
            f[:-5] for f in os.listdir(PRESET_DIR) if f.endswith(".yaml")
        )
        raise FileNotFoundError(f"no preset {name!r}; available: {available}")
    return ConfigParser.load_file(path)


from .bundle_compat import load_reference_bundle, rewrite_targets

__all__ = [
    "ConfigParser",
    "load_preset",
    "load_reference_bundle",
    "rewrite_targets",
    "PRESET_DIR",
]
