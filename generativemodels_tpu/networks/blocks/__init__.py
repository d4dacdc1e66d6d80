from .attention_blocks import (
    AttentionBlock,
    BasicTransformerBlock,
    CrossAttention,
    SpatialTransformer,
)
from .convolutions import ConvND, ConvTransposeND, avg_pool, upsample_nearest
from .encoder_modules import SpatialRescaler
from .mlp import MLPBlock
from .selfattention import SABlock, TransformerBlock
from .spade_norm import SPADE

__all__ = [
    "AttentionBlock",
    "BasicTransformerBlock",
    "CrossAttention",
    "SpatialTransformer",
    "ConvND",
    "ConvTransposeND",
    "avg_pool",
    "upsample_nearest",
    "SpatialRescaler",
    "MLPBlock",
    "SABlock",
    "TransformerBlock",
    "SPADE",
]
