"""Stream-stream event-time interval join — correlating two live
streams (views->clicks, orders->fills, quotes->trades) where BOTH sides
arrive continuously and late.

This is the one join shape where state management is the whole
problem: each side must buffer rows until the other side's matches can
no longer arrive.  The required bound comes from two declarations —

* a WATERMARK on each side (how late its events can be), and
* the JOIN's time-range condition (``right_ts`` within
  ``[left_ts, left_ts + max_delay]``),

from which Spark derives exactly how long each input must be retained
and evicts state past it.  Without the range condition the state is
unbounded (every left row could still match a future right row) and
Spark rejects the append-mode query — the API forces the
100-TB-correct design.

Output in append mode: a matched pair emits once, when the watermark
proves no earlier match can still arrive.  Parity-tested against the
identical batch join over the same landed data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_ingestion_pipeline_spark.streaming.ohlc_stream import (
    _as_event_time,
)

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key_cols`` where the right event lands
    inside ``[left_ts, left_ts + max_delay]``.

    ``how='leftOuter'`` keeps unmatched left rows: in streaming they
    emit (with NULL right columns) only once the watermark proves no
    match can still arrive — conversion-funnel semantics ("views that
    never got a click") with the no-match verdict itself event-time
    correct.  Both inputs are watermarked; non-key columns are prefixed
    so the joined schema is collision-free.  Works identically on
    static frames (the parity tests run the same function on both),
    since the expressions are plain Column ops.

    Output: key cols, then prefixed left and right columns.
    """
    keys = list(key_cols)
    lw = _as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = _as_event_time(right, right_ts).withWatermark(right_ts, watermark)
    lp = lw.select(
        *keys,
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in lw.columns
            if c not in keys
        ],
    )
    rp = rw.select(
        *keys,
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in rw.columns
            if c not in keys
        ],
    )
    lts = lp[f"{left_prefix}{left_ts}"]
    rts = rp[f"{right_prefix}{right_ts}"]
    # the time-range predicate must live IN the join condition — that is
    # what Spark's streaming planner reads to bound and evict state; the
    # same predicate as a post-join filter leaves the join unbounded
    cond = (rts >= lts) & (rts <= lts + F.expr(f"INTERVAL {max_delay}"))
    for k in keys:
        cond = (lp[k] == rp[k]) & cond
    joined = lp.join(rp, cond, how)
    return joined.select(
        *[lp[k].alias(k) for k in keys],
        *[c for c in joined.columns if c.startswith(left_prefix)],
        *[c for c in joined.columns if c.startswith(right_prefix)],
    )
