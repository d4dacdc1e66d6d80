from .pretrained import (
    NAME_MAPS,
    convert_backbone_state_dict,
    load_lpips_lin_weights,
    load_pretrained_perceptual,
)

__all__ = [
    "NAME_MAPS",
    "convert_backbone_state_dict",
    "load_lpips_lin_weights",
    "load_pretrained_perceptual",
]
