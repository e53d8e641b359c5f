"""Streaming histogram sketches: constant-state quantile tracking.

The batch half lives in ``functions/sketches.py`` (``hist_bin`` /
``hist_quantiles``).  Streaming reuses the SAME bin expression, so the
stream maintains per-(window, key) bin counters — O(n_bins) state per
open window, merged associatively by Spark's streaming aggregation —
and the sink stores counters, not values.  Quantile numbers are
computed at read time by ``hist_quantiles`` over the materialized
sketch table: the store-the-sketch/estimate-on-read split that keeps
streaming state bounded no matter the value distribution.

Append mode + watermark means a window's counters are emitted exactly
once, when the watermark closes it — so the sketch table needs no
upsert sink, just parquet appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_ingestion_pipeline_spark.functions.sketches import (
    cm_buckets,
    hist_bin,
    hist_quantiles,
)
from financial_data_ingestion_pipeline_spark.streaming.ohlc_stream import (
    _as_event_time,
)

__all__ = [
    "streaming_value_hist",
    "finalize_hist_quantiles",
    "streaming_countmin",
    "streaming_bloom",
]


def streaming_value_hist(
    stream: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 64,
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    value_col: str = "ltp",
) -> DataFrame:
    """Windowed histogram counters on a stream.

    Output (append mode, one batch of rows per closed window):
    ``symbol, window_start, window_end, _bin, _cnt``.
    """
    src = _as_event_time(stream, ts_col)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(symbol_col).alias("symbol"),
            hist_bin(F.col(value_col), lo, hi, n_bins).alias("_bin"),
        )
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "symbol",
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "_bin",
            "_cnt",
        )
    )


def streaming_countmin(
    stream: DataFrame,
    term_col: str = "source_symbol",
    width: int = 512,
    depth: int = 4,
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Windowed Count-Min counters on a stream — streaming heavy-hitter
    tracking with ``depth x width`` state per open window NO MATTER how
    many distinct terms arrive (the unbounded-vocabulary case where a
    per-term streaming count would grow state without limit).

    Same lane hashing as the batch sketch (:func:`sketches.cm_buckets`),
    so a closed window's counters equal ``countmin_sketch`` over the
    same rows and merge with batch sketches by element-wise SUM;
    estimates come from ``countmin_estimate`` over the materialized
    table.  Append mode + watermark: counters emit once per closed
    window, plain parquet appends, no upsert sink.

    Output: ``window_start, window_end, lane, bucket, cnt``.
    """
    src = _as_event_time(stream, ts_col)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    lanes = F.explode(cm_buckets(F.col(term_col), width, depth)).alias("lb")
    return (
        src.select(F.col(ts_col), lanes)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("lb.lane").alias("lane"),
            F.col("lb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "lane",
            "bucket",
            "cnt",
        )
    )


def finalize_hist_quantiles(
    sketch: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Read-time estimates over a materialized sketch table written by
    :func:`streaming_value_hist` — runs on windows x n_bins rows."""
    return hist_quantiles(
        sketch, ["symbol", "window_start", "window_end"], quantiles, lo, hi, n_bins
    )


def streaming_bloom(
    stream: DataFrame,
    key_col: str = "source_symbol",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Windowed Bloom-filter words on a stream: per closed window, the
    sparse ``(word, bits)`` table of every key seen in that window —
    the membership side of ingest-time dedup maintained continuously.
    State is at most ``m/32`` words per open window regardless of key
    cardinality; a closed window's words equal ``bloom_build`` over
    the same rows (parity-tested) and merge with any batch filter by
    ``bit_or`` on the word key, so daily probes can OR together
    exactly the window range they need.

    Output (append mode): ``window_start, window_end, word, bits``.
    """
    from financial_data_ingestion_pipeline_spark.functions.sketches import (
        BLOOM_WORD_BITS,
        _bloom_positions,
    )

    src = _as_event_time(stream, ts_col)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    pos = F.explode(
        _bloom_positions(F.col(key_col), m_bits, k_hashes)
    ).alias("_p")
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(_p % {BLOOM_WORD_BITS} AS INT))"
    )
    return (
        src.select(F.col(ts_col), pos)
        .select(
            F.col(ts_col),
            (F.col("_p") / BLOOM_WORD_BITS).cast("long").alias("word"),
            mask.alias("_mask"),
        )
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("word"))
        .agg(F.bit_or("_mask").alias("bits"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "word",
            "bits",
        )
    )
