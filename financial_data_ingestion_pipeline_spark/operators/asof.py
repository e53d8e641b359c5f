"""As-of (point-in-time) join — the canonical financial-data operator
Spark has no native form of.

The reference never joins across time series (its only join is the
daily golden-OHLC equi-join, dp:163), but any user of a tick warehouse
needs "the latest quote at or before each event".  Implemented as a
composition of existing DataFrame ops (no UDFs, no range explosion):

1. tag both sides and ``unionByName`` them (schemas padded with NULLs);
   the right side carries ALL value columns as ONE struct, so every
   output value comes from the same matched right row — a right row
   with a NULL in one value column contributes that NULL, exactly like
   DuckDB/pandas ASOF semantics (per-column ``last(ignorenulls)`` fills
   would silently mix columns from different right rows);
2. one window per partition key ordered by (ts, side) with
   ``last(vals_struct, ignorenulls=True)`` over an unbounded-preceding
   frame — every left row sees the most recent right-side row;
3. keep the left rows and project the struct fields.

Cost at scale: ONE shuffle + sort of |L| + |R| rows keyed by the
partition columns — the same price as a sort-merge join, with no
intermediate blow-up (a naive ``L join R on l.ts >= r.ts`` is a range
join: O(|L| x |R|) within each key).

Skew: AQE does NOT split window-function partitions, so one hot key's
entire history is a single task.  For skewed keys pass ``skew_bucket``
(any tumbling-window duration, e.g. ``"7 days"``): the window is then
partitioned by (key, time-bucket) — bounded tasks — and values carry
across bucket boundaries via a per-bucket last-value table (tiny:
|keys| x |buckets|, broadcast back).  Two extra narrow shuffles buy an
upper bound on task size regardless of key skew.

Tie semantics: ``inclusive=True`` (default) matches a right row with
``right_ts == left_ts`` (right rows sort before left rows at equal
timestamps), the same as DuckDB/pandas ``ASOF JOIN`` / ``merge_asof``
backward-inclusive behavior, which makes results oracle-checkable.

Both directions share one core: :func:`asof_join_backward` fills from
the most recent earlier right row, :func:`asof_join_forward` from the
earliest later one (pandas ``direction='forward'``) by scanning in
descending time order — both as O(n) running frames, with the
equal-timestamp side tag and the bucket carry direction flipped
accordingly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "__asof_is_left"
_TS = "__asof_ts"
_VALS = "__asof_vals"
_BKT = "__asof_bkt"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
    skew_bucket: str | None = None,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the most recent
    right row with the same ``by`` key and ``right_ts <= left_ts``
    (``<`` when ``inclusive=False``); NULLs when no prior right row.
    All values come from that single matched row (its NULLs included).

    ``skew_bucket`` switches to the bucketed plan (see module
    docstring) — results are identical, tasks are bounded by bucket.

    Output: all left columns + ``value_cols``.
    """
    return _asof_join(
        left, right, by, left_ts, right_ts, value_cols, inclusive,
        skew_bucket, backward=True,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
    skew_bucket: str | None = None,
) -> DataFrame:
    """Mirror of :func:`asof_join_backward`: the EARLIEST right row with
    ``right_ts >= left_ts`` (``>`` when ``inclusive=False``) — pandas
    ``merge_asof(direction='forward')`` / DuckDB ``ON l.ts <= r.ts``
    semantics.  Same single-shuffle union+window plan scanned in
    DESCENDING (ts, side) order with the same O(n) running frame (see
    the core's comment — a literal unbounded-following frame is
    re-evaluated per row by Spark); the ``skew_bucket`` variant carries
    each bucket's FIRST right value back into earlier buckets."""
    return _asof_join(
        left, right, by, left_ts, right_ts, value_cols, inclusive,
        skew_bucket, backward=False,
    )


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool,
    skew_bucket: str | None,
    backward: bool,
) -> DataFrame:
    by = list(by)
    value_cols = list(value_cols)
    passthrough = [c for c in left.columns if c not in by and c != left_ts]
    vals_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )

    l_tagged = left.select(
        *by,
        F.col(left_ts).alias(_TS),
        *[F.col(c) for c in passthrough],
        F.lit(None).cast(vals_type).alias(_VALS),
        F.lit(1).alias(_SIDE),
    )
    # At equal timestamps the right row must fall INSIDE the left row's
    # frame when inclusive: before it (side 0) for the backward
    # preceding-frame, after it (side 2) for the forward following-frame.
    if backward:
        r_side = 0 if inclusive else 2
    else:
        r_side = 2 if inclusive else 0
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias(_TS),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough
        ],
        F.struct(*[F.col(c) for c in value_cols]).alias(_VALS),
        F.lit(r_side).alias(_SIDE),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Both directions run as a RUNNING frame (unbounded preceding ->
    # current row, O(n) incremental evaluation); forward simply scans in
    # DESCENDING (ts, side) order, where "most recently seen right row"
    # is the earliest later one.  The naive forward frame — first() over
    # (current row, unbounded following) — is re-evaluated from scratch
    # per row by Spark (no inverse aggregates), i.e. O(n^2) per key:
    # measured 63 s vs ~1 s on the sf0.1 contract query.
    def order(window_cols):
        if backward:
            return [F.col(c).asc() for c in window_cols]
        return [F.col(c).desc() for c in window_cols]

    def pick(col, window):
        return F.last(col, ignorenulls=True).over(
            window.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if skew_bucket is None:
        w = Window.partitionBy(*by).orderBy(*order([_TS, _SIDE]))
        filled = unioned.select(
            *by, _TS, _SIDE, *passthrough, pick(_VALS, w).alias(_VALS)
        )
    else:
        unioned = unioned.withColumn(
            _BKT, F.window(F.col(_TS), skew_bucket)["start"]
        )
        w_in = Window.partitionBy(*by, _BKT).orderBy(*order([_TS, _SIDE]))
        in_bucket = unioned.select(
            *by, _BKT, _TS, _SIDE, *passthrough,
            pick(_VALS, w_in).alias(_VALS),
        )
        # boundary right-side value per (key, bucket) — the LAST for
        # backward (carried into later buckets), the FIRST for forward
        # (carried into earlier buckets).  Round-12 (guide §2.4): the
        # edge is read off ``in_bucket`` itself — the FILLED value at
        # the bucket's order-final row IS the bucket's boundary value
        # (any right row sorts at or before that row inside the
        # bucket), and a bucket with no right rows fills to NULL there,
        # exactly the NULL the old left-join produced.  Because
        # ``in_bucket`` is already hash-partitioned by (key, bucket)
        # from the window's own exchange, this groupBy plans WITHOUT a
        # new exchange — where the round-11 shape re-derived the union
        # twice more (a filtered map-side aggregate + a distinct, two
        # full source passes and two narrow exchanges).  The same
        # aggregate's group set IS the (key, bucket) universe, so the
        # old ``all_buckets`` distinct + left join disappear too.
        # (The round-11 "merge into one union aggregate" attempt was
        # different and measured SLOWER — it dragged a struct max_by
        # through a NEW shuffle; this one rides an exchange that
        # already exists.)
        edge_at = (F.max_by if backward else F.min_by)(
            F.col(_VALS), F.struct(F.col(_TS), F.col(_SIDE))
        )
        bucket_edge = in_bucket.groupBy(*by, _BKT).agg(
            edge_at.alias("__bedge")
        )
        w_carry = Window.partitionBy(*by).orderBy(*order([_BKT]))
        carry_val = F.last("__bedge", ignorenulls=True).over(
            w_carry.rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = bucket_edge.select(*by, _BKT, carry_val.alias("__carry"))
        filled = in_bucket.join(F.broadcast(carry), [*by, _BKT], "left").select(
            *by, _TS, _SIDE, *passthrough,
            F.coalesce(F.col(_VALS), F.col("__carry")).alias(_VALS),
        )

    return filled.filter(F.col(_SIDE) == 1).select(
        *by,
        F.col(_TS).alias(left_ts),
        *passthrough,
        *[F.col(_VALS)[c].alias(c) for c in value_cols],
    )
