from . import (
    dedup,
    graph,
    multimodal,
    packing,
    similarity,
    sketches,
    text,
    vectorized,
)

__all__ = [
    "dedup",
    "graph",
    "multimodal",
    "packing",
    "similarity",
    "sketches",
    "text",
    "vectorized",
]
