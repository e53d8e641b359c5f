from . import (
    dedup,
    multimodal,
    packing,
    similarity,
    sketches,
    text,
    vectorized,
)

__all__ = [
    "dedup",
    "multimodal",
    "packing",
    "similarity",
    "sketches",
    "text",
    "vectorized",
]
