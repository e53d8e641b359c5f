"""Spark 4 ``transformWithStateInPandas``: per-key running extremes.

The successor API to ``applyInPandasWithState`` (used by
``streaming/stateful.py``): state is declared as typed handles
(ValueState here) owned by a ``StatefulProcessor``, backed by the
RocksDB state store — the form that scales state past executor memory
and supports TTL/timers.  This module covers the API with the
simplest genuinely stateful op: per-symbol running min/max/count
since stream start (a windowless aggregate no watermark can bound).

Parity contract: counts and extremes are order-independent, so the
stream must equal the batch ``groupBy(min, max, count)`` on whatever
prefix of the data has been processed — asserted across a forced
multi-micro-batch run in the tests.

Environment note: the TWS worker protocol ships state over protobuf
(``google.protobuf`` must be importable by executors); the parity
test skips where it is absent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("run_min", T.DoubleType()),
        T.StructField("run_max", T.DoubleType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("run_min", T.DoubleType()),
        T.StructField("run_max", T.DoubleType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)


class RunningExtremesProcessor(StatefulProcessor):
    """ValueState holding (min, max, count) per key; one output row
    per key per micro-batch with the updated running values."""

    def __init__(self, value_col: str = "value"):
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("extremes", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            cur_min, cur_max, n = self._state.get()
        else:
            cur_min, cur_max, n = None, None, 0
        for pdf in rows:
            vals = pdf[self._value_col].dropna()
            if len(vals):
                lo, hi = float(vals.min()), float(vals.max())
                cur_min = lo if cur_min is None else min(cur_min, lo)
                cur_max = hi if cur_max is None else max(cur_max, hi)
            n += int(len(pdf))
        self._state.update((cur_min, cur_max, n))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "run_min": [cur_min],
                "run_max": [cur_max],
                "n_ticks": [n],
            }
        )

    def close(self) -> None:
        pass


def running_extremes(
    ticks: DataFrame,
    symbol_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running min/max/count via ``transformWithStateInPandas``
    (requires the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly)."""
    return ticks.groupBy(symbol_col).transformWithStateInPandas(
        statefulProcessor=RunningExtremesProcessor(value_col),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
