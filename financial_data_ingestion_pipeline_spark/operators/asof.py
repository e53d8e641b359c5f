"""As-of (point-in-time) join — the canonical financial-data operator
Spark has no native form of.

The reference never joins across time series (its only join is the
daily golden-OHLC equi-join, dp:163), but any user of a tick warehouse
needs "the latest quote at or before each event".  Implemented as a
composition of existing DataFrame ops (no UDFs, no range explosion):

1. tag both sides and ``unionByName`` them (schemas padded with NULLs),
2. one window per partition key ordered by (ts, side) with
   ``last(value, ignorenulls=True)`` over an unbounded-preceding frame —
   every left row sees the most recent right-side values,
3. keep the left rows.

Cost at scale: ONE shuffle + sort of |L| + |R| rows keyed by the
partition columns — the same price as a sort-merge join, with no
intermediate blow-up (a naive ``L join R on l.ts >= r.ts`` is a range
join: O(|L| x |R|) within each key).  Skewed keys are split by AQE.

Tie semantics: ``inclusive=True`` (default) matches a right row with
``right_ts == left_ts`` (right rows sort before left rows at equal
timestamps), the same as DuckDB/pandas ``ASOF JOIN`` / ``merge_asof``
backward-inclusive behavior, which makes results oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the most recent
    right row with the same ``by`` key and ``right_ts <= left_ts``
    (``<`` when ``inclusive=False``); NULLs when no prior right row.

    Output: all left columns + ``value_cols``.
    """
    by = list(by)
    value_cols = list(value_cols)
    passthrough = [c for c in left.columns if c not in by and c != left_ts]

    l_tagged = left.select(
        *by,
        F.col(left_ts).alias("__asof_ts"),
        *[F.col(c) for c in passthrough],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(1).alias(_SIDE),
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("__asof_ts"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough
        ],
        *[F.col(c) for c in value_cols],
        F.lit(0 if inclusive else 2).alias(_SIDE),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by)
        .orderBy("__asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by,
        "__asof_ts",
        _SIDE,
        *passthrough,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *by,
        F.col("__asof_ts").alias(left_ts),
        *passthrough,
        *value_cols,
    )
