from .attention import dot_product_attention
from .embeddings import get_timestep_embedding
from .flash_attention import flash_attention
from .sharded_attention import sequence_parallel_attention, sequence_sharding

__all__ = [
    "dot_product_attention",
    "get_timestep_embedding",
    "flash_attention",
    "sequence_parallel_attention",
    "sequence_sharding",
]
