"""Custom stateful streaming operator: per-symbol running trade stats
(VWAP, totals) via ``applyInPandasWithState``.

This is the ``GroupState`` pattern the built-in streaming aggregates
can't express: state that accumulates *across micro-batches forever*
(a windowed agg expires with its watermark; VWAP-since-open must not),
updated with arbitrary per-group logic and emitted once per batch.

Scale notes: state is one tiny tuple per symbol (three doubles), so
state-store size is O(|symbols|), independent of tick volume; updates
arrive Arrow-batched per group.  The shuffle is the same single
keyBy(symbol) any grouped aggregate pays.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: (sum price*qty, sum qty, tick count)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("sum_pv", T.DoubleType()),
        T.StructField("sum_qty", T.DoubleType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("vwap", T.DoubleType()),
        T.StructField("total_qty", T.DoubleType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)


def running_symbol_stats(
    ticks: DataFrame,
    symbol_col: str = "source_symbol",
    price_col: str = "ltp",
    qty_col: str = "ltq",
) -> DataFrame:
    """Streaming per-symbol running VWAP: emits one row per symbol per
    micro-batch with the cumulative stats since the query started."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sum_pv, sum_qty, n_ticks = state.get
        else:
            sum_pv, sum_qty, n_ticks = 0.0, 0.0, 0
        for pdf in pdfs:
            pv = (pdf[price_col] * pdf[qty_col]).sum()
            sum_pv += float(0.0 if pd.isna(pv) else pv)
            q = pdf[qty_col].sum()
            sum_qty += float(0.0 if pd.isna(q) else q)
            n_ticks += len(pdf)
        state.update((sum_pv, sum_qty, n_ticks))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "vwap": [sum_pv / sum_qty if sum_qty else None],
                "total_qty": [sum_qty],
                "n_ticks": [n_ticks],
            }
        )

    return ticks.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
