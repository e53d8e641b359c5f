from . import (
    dedup_stream,
    join_stream,
    ohlc_stream,
    scd_stream,
    sketch_stream,
    stateful,
)

__all__ = [
    "dedup_stream",
    "join_stream",
    "ohlc_stream",
    "scd_stream",
    "sketch_stream",
    "stateful",
]
