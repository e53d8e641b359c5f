"""OHLC aggregation and time-bucket resampling.

Reference surface: grouped multi-agg OHLC (dp:155-161, A1-A3), the
``hourly_ohlc`` materialized view (dp:290-314, W1-W4/D3), and the
parametrized aggregation task (dp:316-347, D4).

Semantics decisions (SURVEY.md §2.9):

- pandas positional ``first``/``last`` (dp:156) and the reference's
  default-frame ``last_value`` bug (Q1, dp:299,333) are both replaced by
  the evident *intent*: deterministic open/close = value at the
  min/max event time.  Implemented with ``min_by``/``max_by`` over a
  composite ``(ts, *tie_cols)`` ordering struct, so results stay
  deterministic even when two ticks share a timestamp (which WILL
  happen at 100 TB even though the small fixtures have no ties).
- ``date_trunc('5 minutes', ...)`` is invalid PG (Q2, dp:320-333); the
  intent — arbitrary-width tumbling buckets — is ``F.window(ts, freq)``.
- Sums are computed on DECIMAL and cast back to double: decimal
  addition is associative, so the result is bit-identical regardless of
  partitioning / shuffle order (double summation is not).

Scale notes: each function is a single groupBy -> one shuffle on the
(symbol, bucket) key; partial (map-side) aggregation is automatic, and
AQE handles skewed symbols.  No windows-over-sort: the reference's SQL
window formulation (dp:297-305) would shuffle AND sort per partition and
then need DISTINCT (A6); the groupBy form is strictly cheaper and is the
plan you want at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: frequency-name map mirroring the reference's freq_map (dp:320-325),
#: expressed as Spark window durations.
FREQ_MAP = {
    "second": "1 second",
    "minute": "1 minute",
    "5minute": "5 minutes",
    "15minute": "15 minutes",
    "hour": "1 hour",
    "day": "1 day",
}


def _order_key(ts_col: str, tie_cols: Sequence[str]) -> Column:
    """Deterministic ordering key for min_by/max_by open/close."""
    cols = [F.col(ts_col)] + [F.col(c) for c in tie_cols]
    return F.struct(*cols) if len(cols) > 1 else cols[0]


def ohlc_aggs(
    price_col: str,
    ts_col: str,
    tie_cols: Sequence[str] = (),
    volume_col: str | None = None,
    volume_decimals: int = 2,
) -> list[Column]:
    """The OHLC aggregate list (dp:155-161 intent semantics).

    ``volume_col`` adds an order-independent (decimal-summed) volume
    total and a tick count.
    """
    key = _order_key(ts_col, tie_cols)
    aggs = [
        F.min_by(price_col, key).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, key).alias("close"),
    ]
    if volume_col is not None:
        dec = F.col(volume_col).cast(f"decimal(28,{volume_decimals})")
        aggs.append(F.sum(dec).cast("double").alias("total_volume"))
    aggs.append(F.count(F.lit(1)).alias("n_ticks"))
    return aggs


def daily_ohlc(
    ticks: DataFrame,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
    volume_col: str | None = None,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-(symbol, trading day) OHLC — the dp:155-161 aggregate, computed
    per day rather than per file (fixes quirk Q5)."""
    return (
        ticks.groupBy(
            F.col(symbol_col).alias("symbol"),
            F.to_date(ts_col).alias("trade_date"),
        ).agg(*ohlc_aggs(price_col, ts_col, tie_cols, volume_col))
    )


def bucketed_ohlc(
    ticks: DataFrame,
    freq: str,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
    volume_col: str | None = None,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-window OHLC for an arbitrary bucket width.

    Replaces both the ``hourly_ohlc`` MV (dp:290-314, ``freq='1 hour'``)
    and the broken ``date_trunc(interval)`` of the parametrized task
    (Q2/Q3).  ``freq`` is a Spark duration ('5 minutes', '1 hour') or a
    reference freq-map key ('5minute', 'hour').
    """
    duration = FREQ_MAP.get(freq, freq)
    bucket = F.window(F.col(ts_col), duration)
    return (
        ticks.groupBy(
            F.col(symbol_col).alias("symbol"),
            bucket["start"].alias("bucket_start"),
        ).agg(*ohlc_aggs(price_col, ts_col, tie_cols, volume_col))
    )


def resample(
    ticks: DataFrame,
    freq: str,
    from_ts: str | None = None,
    to_ts: str | None = None,
    symbols: Sequence[str] | None = None,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
    volume_col: str | None = None,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """The parametrized aggregation task (dp:316-347, D4) with quirks
    fixed: windows actually work for sub-hour widths (Q2), grouping is
    by (symbol, bucket) (Q3), and ``symbols`` is honored (Q6 — the
    reference accepts it but never applies it; ``["ALL"]``/None = no
    filter).

    The time filter is a plain BETWEEN on the timestamp column, which
    Catalyst pushes into the parquet scan (row-group min/max skipping)
    and, on a date-partitioned warehouse, prunes partitions.
    """
    df = ticks
    if from_ts is not None and to_ts is not None:
        df = df.filter(F.col(ts_col).between(F.lit(from_ts).cast("timestamp_ntz"),
                                             F.lit(to_ts).cast("timestamp_ntz")))
    if symbols and list(symbols) != ["ALL"]:
        df = df.filter(F.col(symbol_col).isin(list(symbols)))
    return bucketed_ohlc(df, freq, symbol_col, ts_col, price_col, volume_col, tie_cols)
