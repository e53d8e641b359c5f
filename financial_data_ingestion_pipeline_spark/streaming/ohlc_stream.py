"""Structured Streaming upgrade path (X2).

The reference has no streaming at all — README:8-9 claims concurrent
per-day processing but ``airflow.cfg:52`` pins ``SequentialExecutor``,
so the DAG is fully serial batch.  This module is the intended upgrade:
the tick directory becomes a file-source stream, the ``hourly_ohlc``
materialized view (dp:290-314) becomes a continuously-maintained
windowed aggregate, and duplicate ticks are dropped with bounded state.

Design for scale:

- **Watermarks bound state.**  Every stateful op here declares
  ``withWatermark(ts, delay)`` so window state is dropped once the
  watermark passes — without it, a 100 TB backfill would accumulate
  unbounded aggregation state.
- **OHLC is the same declarative aggregate as batch** (min_by/max_by
  over the event-time key) — one shuffle on (symbol, window), partial
  aggregation map-side, exactly the batch plan applied incrementally.
- **Dedup is ``dropDuplicatesWithinWatermark``** on the natural tick key
  (symbol, timestamp): state expires with the watermark instead of
  growing forever like plain ``dropDuplicates`` would.
- **The MV is maintained via ``foreachBatch``** overwriting only the
  date partitions present in each micro-batch
  (``partitionOverwriteMode=dynamic``) — an incremental materialized
  view without rewriting history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ohlc import FREQ_MAP, ohlc_aggs
from ..schemas import TICK_CLEAN_SCHEMA, WAREHOUSE_SCHEMA


def stream_ticks(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the landing directory.

    New files (one folder per trading day, exactly the reference's drop
    layout) are discovered per micro-batch; ``maxFilesPerTrigger``
    bounds batch size during backfills.
    """
    reader = spark.readStream.format(fmt).schema(schema or WAREHOUSE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def _as_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (not NTZ); with the engine's UTC
    session timezone the cast is wall-clock identical."""
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def dedup_ticks_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("source_symbol", "timestamp"),
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful exact-duplicate drop with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key only until the
    watermark passes its event time — state is O(ticks inside the
    watermark window), not O(all ticks ever).
    """
    return (
        _as_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def streaming_ohlc(
    stream: DataFrame,
    freq: str = "hour",
    watermark: str | None = "10 minutes",
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
    volume_col: str | None = None,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-window OHLC over the stream — the hourly_ohlc MV
    (dp:290-314) maintained incrementally, intent semantics (Q1: close =
    price at max event time, via the same ``ohlc_aggs`` as batch).

    Pass ``watermark=None`` when an upstream stateful operator (e.g.
    :func:`dedup_ticks_stream`) already declared one — Spark disallows
    redefining the watermark between chained stateful operators.
    """
    duration = FREQ_MAP.get(freq, freq)
    win = F.window(F.col(ts_col), duration)
    src = _as_event_time(stream, ts_col)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(win, F.col(symbol_col).alias("symbol"))
        .agg(*ohlc_aggs(price_col, ts_col, tie_cols, volume_col))
        .select(
            "symbol",
            F.col("window.start").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            *(["total_volume"] if volume_col else []),
            "n_ticks",
        )
    )


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    value_col: str = "ltp",
) -> DataFrame:
    """Session windows on the stream — the same ``F.session_window``
    aggregate as the batch ``operators/analytics.py::sessionize``, run
    incrementally: session state merges as events arrive and a session
    finalizes (append-mode emit) once the watermark passes its end.
    State is O(open sessions), bounded by the watermark.

    Same output columns as the batch operator, so stream/batch parity
    is a direct DataFrame comparison (see tests).
    """
    src = _as_event_time(stream, ts_col)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(symbol_col).alias("symbol"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(28,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "symbol",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def write_ohlc_table(
    ohlc_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    key_cols: Sequence[str] = ("symbol", "bucket_start"),
) -> StreamingQuery:
    """Maintain the OHLC table as date-partitioned parquet via a keyed
    ``foreachBatch`` MERGE: each micro-batch rewrites only the dates it
    touches, and rows it does NOT update within those dates are carried
    over (anti-join on ``key_cols`` + union) — so a multi-batch backfill
    or a scheduled re-run never drops previously-written windows.  A
    plain dynamic-partition overwrite would: update-mode batches contain
    only the windows changed in that batch, so overwriting the whole
    date partition deletes that date's other hours.

    The merged frame is ``localCheckpoint``-ed before the write so its
    lineage no longer references the files being overwritten.  This is
    deliberately NOT the ``materialize.pin`` persist default (round-8
    A/B, fresh alternating sessions, 2M-row base / 100k-row batch
    merge-then-overwrite: persist 1.32 s vs ckpt 1.60 s median):
    persist KEEPS lineage into the very files the write truncates, so
    a cached block lost mid-overwrite on a real cluster would
    recompute from a half-rewritten path — silent-corruption class —
    where the checkpoint fail-stops the batch and the streaming
    checkpoint replays it.  The ~17% per-micro-batch cost buys
    fail-stop semantics; the risk window (micro-batch write) is also
    bounded, unlike the loop operators where persist won.  On a
    transactional table format (Delta/Iceberg) this whole function
    collapses to ``MERGE INTO`` on ``key_cols`` — swap the body, keep
    the contract.  ``partitionOverwriteMode`` is set per-write (a
    session-wide mutation inside foreachBatch would leak into unrelated
    writes on the shared session).

    ``available_now=True`` drains the backlog then stops — batch-like
    runs on a schedule; ``False`` runs continuously.
    """
    keys = list(key_cols)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        batch = batch.withColumn("trade_date", F.to_date("bucket_start"))
        merged = batch
        try:
            touched = [
                r.trade_date
                for r in batch.select("trade_date").distinct().collect()
            ]
            existing = spark.read.parquet(out_path).filter(
                F.col("trade_date").isin(touched)
            )
            carried = existing.join(batch.select(*keys), keys, "left_anti")
            merged = batch.unionByName(carried.select(*batch.columns))
        except AnalysisException:
            pass  # first batch: nothing on disk yet
        (
            merged.localCheckpoint(eager=True)
            .repartition("trade_date")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("trade_date")
            .parquet(out_path)
        )

    writer = (
        ohlc_stream.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ohlc_stream_once(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    freq: str = "hour",
    watermark: str = "10 minutes",
    schema=None,
    dedup: bool = True,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
    tie_cols: Sequence[str] = (),
    max_files_per_trigger: int | None = None,
) -> None:
    """End-to-end one-shot: stream the landing dir, dedup, aggregate,
    land the OHLC table, and block until the backlog is drained.
    ``max_files_per_trigger`` bounds each micro-batch during backfills
    (the keyed-merge sink makes multi-batch runs safe)."""
    stream = stream_ticks(
        spark,
        in_path,
        schema=schema or TICK_CLEAN_SCHEMA,
        max_files_per_trigger=max_files_per_trigger,
    )
    if dedup:
        stream = dedup_ticks_stream(
            stream, keys=(symbol_col, ts_col), ts_col=ts_col, watermark=watermark
        )
    agg = streaming_ohlc(
        stream,
        freq=freq,
        watermark=None if dedup else watermark,
        symbol_col=symbol_col,
        ts_col=ts_col,
        price_col=price_col,
        tie_cols=tie_cols,
    )
    q = write_ohlc_table(agg, out_path, checkpoint, available_now=True)
    q.awaitTermination()


def write_snapshot_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Stream -> snapshot table: every micro-batch lands as ONE atomic
    manifest commit (``warehouse.snapshot_commit``), so downstream
    batch readers always see whole micro-batches — never a partially
    written file set — and can time-travel the ingest history
    batch-by-batch.  Combined with ``warehouse.maintain_ohlc_mv`` this
    closes the loop: continuous ingest with atomic visibility plus
    O(increment) view refresh, no table format dependency.

    Note the split of atomicity duties: Spark's checkpoint guarantees
    each micro-batch is processed once; the manifest rename guarantees
    readers never observe a half-commit.  A crash between the parquet
    write and the manifest rename leaves an orphan dir that
    ``vacuum_snapshots`` reclaims and a batch the restarted query
    simply re-commits.
    """
    from financial_data_ingestion_pipeline_spark.operators.warehouse import (
        snapshot_commit,
    )

    def commit(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            snapshot_commit(batch, table_dir, mode="append")

    writer = (
        stream.writeStream.foreachBatch(commit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
