"""Streaming truncated EWMA with EXACT batch parity.

The batch form (``operators/analytics.py::ewma_smooth``) is an 8-slot
lag ladder with power-of-two weights; its whole point is bit-for-bit
reproducibility.  This stream keeps that contract: per-key state is
the last ``depth`` values (a fixed-size ladder, O(depth) per key —
state-store size is O(|symbols| x depth) regardless of tick volume),
and each incoming row is scored with the *same* fixed-order float
arithmetic the batch expression uses, so a row's streaming EWMA equals
its batch EWMA exactly — not approximately — across any micro-batch
split.

Parity precondition: each key's rows must arrive in event-time order
across micro-batches (an ordered log / ingest-time source).  Out-of-
order data needs a watermarked reorder buffer upstream; silently
scoring late rows against a newer ladder would diverge from batch.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("ladder", T.ArrayType(T.DoubleType()))]
)

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_terms", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def streaming_ewma(
    ticks: DataFrame,
    depth: int = 8,
    symbol_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """One EWMA row per input row, scored against the per-key ladder.

    NULL values occupy a ladder slot but contribute neither weight nor
    to ``n_terms`` — the exact slot semantics of the batch lag chain,
    so parity holds on gappy data too.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ladder: list[float] = list(state.get[0]) if state.exists else []
        out: dict[str, list] = {f.name: [] for f in EWMA_OUTPUT_SCHEMA}
        # concat BEFORE sorting: a large micro-batch arrives as several
        # Arrow chunks in arbitrary order; sorting chunks independently
        # would feed the ladder out of event-time order (same pattern
        # as streaming/stateful.py's order-sensitive ops)
        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else None
        if whole is not None and len(whole):
            pdf = whole.sort_values([ts_col, id_col])
            for ts, eid, v in zip(pdf[ts_col], pdf[id_col], pdf[value_col]):
                fv = float("nan") if pd.isna(v) else float(v)
                ladder.append(fv)
                del ladder[:-depth]
                # newest slot gets weight 2^(depth-1); additions run
                # newest-first — the batch expression's exact order
                total, m = 0.0, 0
                for k in range(len(ladder)):
                    slot = ladder[len(ladder) - 1 - k]
                    if not math.isnan(slot):
                        total += slot * float(1 << (depth - 1 - k))
                        m += 1
                # m == 0 (all-null ladder): no data -> NULL, the same
                # convention the batch operator and oracle emit
                norm = float((1 << depth) - (1 << (depth - m)))
                out["symbol"].append(key[0])
                out["ts"].append(ts)
                out["event_id"].append(int(eid))
                out["value"].append(None if math.isnan(fv) else fv)
                out["n_terms"].append(m)
                out["ewma"].append(total / norm if m else None)
        state.update((ladder,))
        yield pd.DataFrame(out)

    return ticks.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
