from . import (
    dedup_stream,
    ohlc_stream,
    scd_stream,
    sketch_stream,
    stateful,
)

__all__ = [
    "dedup_stream",
    "ohlc_stream",
    "scd_stream",
    "sketch_stream",
    "stateful",
]
