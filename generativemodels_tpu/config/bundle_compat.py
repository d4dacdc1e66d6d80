"""Load *reference* MONAI-bundle configs against this framework.

The reference model-zoo drives everything through YAML/JSON bundle
configs whose `_target_` strings name `generative.*` torch classes
(model-zoo/models/mednist_ddpm/bundle/configs/common.yaml:21-60,
brain_image_synthesis_latent_diffusion_model/configs/inference.json).
A user migrating from the reference has those files already; this module
lets them instantiate the TPU-native equivalents from the *unmodified*
bundle file by rewriting the target prefixes per the symbol map in
docs/MIGRATION.md.

Only component definitions translate — entries that are torch-runtime
plumbing (``$...to(@device)`` moves, DDP rank wiring, Ignite handlers,
dict transforms) have no TPU analogue and are left in the tree
un-instantiated; request only the ids you need (lazy instantiation means
unrelated torch expressions are never evaluated).

Example::

    from generativemodels_tpu.config import load_reference_bundle
    parser = load_reference_bundle("bundle/configs/common.yaml")
    unet = parser.resolve("network_def")        # TPU DiffusionModelUNet
    inferer = parser.resolve("inferer")         # TPU DiffusionInferer
"""
from __future__ import annotations

from typing import Any

from .parser import ConfigParser

# Prefix rewrites, most specific first. Covers every `generative.*`
# public surface plus the MONAI network re-exports the bundles use.
TARGET_PREFIX_MAP: tuple[tuple[str, str], ...] = (
    ("generative.networks.nets.", "generativemodels_tpu.networks.nets."),
    ("generative.networks.schedulers.", "generativemodels_tpu.networks.schedulers."),
    ("generative.networks.blocks.", "generativemodels_tpu.networks.blocks."),
    ("generative.networks.layers.", "generativemodels_tpu.networks.layers."),
    ("generative.inferers.", "generativemodels_tpu.inferers."),
    ("generative.losses.", "generativemodels_tpu.losses."),
    ("generative.metrics.", "generativemodels_tpu.metrics."),
    ("generative.engines.", "generativemodels_tpu.engines."),
    ("generative.utils.", "generativemodels_tpu.utils."),
)


def rewrite_targets(node: Any, extra_map: dict[str, str] | None = None) -> Any:
    """Recursively rewrite `_target_` strings from reference to TPU names.

    `extra_map` maps *exact* target strings (e.g. a bundle's local
    ``scripts.sampler.Sampler``) to replacement dotted paths.
    """
    if isinstance(node, dict):
        out = {}
        for key, value in node.items():
            if key == "_requires_":
                # reference `_requires_` chains force torch runtime side
                # effects (state_dict loads, device moves) before
                # instantiation — none apply here; params load via
                # utils/checkpoint + networks/pretrained instead
                continue
            if key == "_target_" and isinstance(value, str):
                value = _rewrite_one(value, extra_map)
            else:
                value = rewrite_targets(value, extra_map)
            out[key] = value
        return out
    if isinstance(node, list):
        return [rewrite_targets(item, extra_map) for item in node]
    return node


def _rewrite_one(target: str, extra_map: dict[str, str] | None) -> str:
    if extra_map and target in extra_map:
        return extra_map[target]
    for prefix, replacement in TARGET_PREFIX_MAP:
        if target.startswith(prefix):
            return replacement + target[len(prefix):]
    return target


def load_reference_bundle(
    path: str, extra_map: dict[str, str] | None = None
) -> ConfigParser:
    """Parse a reference bundle YAML/JSON file with targets rewritten.

    Returns a :class:`ConfigParser`; call ``resolve(id)`` for the ids
    you need (``network_def``, ``scheduler``, ``inferer``, ...).
    """
    parser = ConfigParser.load_file(path)
    return ConfigParser(rewrite_targets(parser.config, extra_map))
