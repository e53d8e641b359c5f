"""Streaming maintenance of the materialized ExactSubstr anchor
index (``functions/dedup.py::build_span_index``).

Documents arrive as a stream; each micro-batch anchors ITSELF (the
same ``_span_anchors`` xxhash64 kernel as the batch builder — the
four anchor producers MUST hash identically or probes silently miss),
reduces to its DISTINCT hashes, and lands in the index as its own
``batch_id=N`` partition.  Anchor hashing depends only on the
document's own text — nothing corpus-global to freeze — so the index
stays exactly "the union of every batch's distinct anchor hashes" and
``span_probe_index`` needs no knowledge of how it was built.

Duplicates ACROSS partitions (a 16-gram that appears in many batches)
are intentionally left in place: the probe is a left-semi join, for
which duplicate build keys are harmless, and deduplicating history on
every append would turn an O(batch) maintenance step into an O(index)
one.

Idempotence: a replayed micro-batch dynamic-overwrites ONLY its own
``batch_id`` partition, so at-least-once delivery never grows the
index beyond one partition per batch.  This is the contamination
guard at ingest: anchor the arrivals in-flight, probe them against
the standing index (which spans of today's batch copy the corpus
verbatim), append the keepers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

__all__ = [
    "maintain_span_index",
    "probe_and_maintain_span_index",
    "cut_and_maintain_span_index",
]


def _is_missing_path(e: AnalysisException) -> bool:
    """True iff the AnalysisException is the missing-input-path case.

    Matches the structured error class first (``PATH_NOT_FOUND`` since
    Spark 3.4; ``getCondition`` is the 4.x accessor name, ``getErrorClass``
    the 3.x one) and falls back to both known message phrasings — the
    engine-version-specific substring match alone would mis-fail the
    bootstrap batch on older Sparks that say 'Path does not exist'."""
    for acc in ("getCondition", "getErrorClass"):
        try:
            cond = getattr(e, acc)()
        except Exception:
            cond = None
        if cond:
            return "PATH_NOT_FOUND" in cond
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def maintain_span_index(
    doc_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    min_len: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    partition_base: int = 1,
) -> StreamingQuery:
    """Anchor each micro-batch and land its distinct hashes in the
    index under an idempotent ``batch_id`` partition
    (layout-compatible with ``functions/dedup.py::build_span_index``).

    Partition ids are ``partition_base + foreachBatch batch_id``:
    idempotence holds WITHIN one streaming checkpoint (a replay
    rewrites only its own partition), but Spark restarts batch ids at
    0 for a NEW checkpoint — re-attaching a fresh stream to an
    existing index with the default base would dynamic-overwrite the
    old stream's partitions.  Pass ``partition_base`` above the
    index's current max ``batch_id`` when attaching to prior history
    (the same rule applies to every batch_id-partitioned maintainer
    in this package).
    """
    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        _span_anchors,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            _span_anchors(batch, min_len, id_col, text_col)
            .select("h")
            .distinct()
            # partition_base offsets past batch_id=0 (the batch
            # builder's bootstrap) and any prior stream's partitions
            .withColumn(
                "batch_id", F.lit(partition_base + batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_path}/anchors")
        )

    writer = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cut_and_maintain_span_index(
    doc_stream: DataFrame,
    index_path: str,
    clean_out: str,
    spans_out: str,
    checkpoint: str,
    min_len: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    partition_base: int = 1,
) -> StreamingQuery:
    """The streaming ingest-with-cut loop — the stream sibling of
    ``plans/corpus_pipeline.py::run_incremental_ingest``'s span path:
    each micro-batch is PROBED against the standing anchor index, the
    contaminated spans are QUARANTINED to ``spans_out`` AND CUT out of
    the batch text, the CLEANED documents land at ``clean_out``
    (schema preserved, plus ``n_cut``), and the clean text's distinct
    anchors are appended so later batches see this batch as corpus.
    Anchors come from the CLEAN text — what actually landed — so the
    index never advertises spans the cut removed.

    All three writes are dynamic overwrites of the batch's own
    ``batch_id`` partition (idempotent under at-least-once replay);
    ``partition_base``: see :func:`maintain_span_index`.  A missing
    index is the first-batch bootstrap (nothing to probe; anchors
    still land).
    """
    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        _span_anchors,
        cut_spans,
        span_probe_index,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        pid = F.lit(partition_base + batch_id).cast("long")
        try:
            spans = span_probe_index(
                batch, spark, index_path,
                min_len=min_len, id_col=id_col, text_col=text_col,
            )
        except AnalysisException as e:
            if not _is_missing_path(e):
                raise
            id_type = batch.schema[id_col].dataType.simpleString()
            spans = spark.createDataFrame(
                [], f"{id_col} {id_type}, span_start long, span_len long"
            )
        (
            spans.withColumn("batch_id", pid)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(spans_out)
        )
        cut = cut_spans(batch, spans, id_col=id_col, text_col=text_col)
        cols = batch.columns
        cleaned = (
            batch.drop(text_col)
            .join(
                cut.select(
                    id_col, F.col("clean_text").alias(text_col), "n_cut"
                ),
                id_col,
            )
            .select(*cols, "n_cut")
        )
        (
            cleaned.withColumn("batch_id", pid)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(clean_out)
        )
        # anchors of the CLEAN text (read back from the committed
        # partition — lineage through the pre-cut batch would re-read
        # the index this very function appends to below, the
        # silent-recompute hazard class run_incremental_ingest
        # checkpoints around)
        landed = spark.read.parquet(clean_out).filter(
            F.col("batch_id") == partition_base + batch_id
        )
        (
            _span_anchors(landed, min_len, id_col, text_col)
            .select("h")
            .distinct()
            .withColumn("batch_id", pid)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_path}/anchors")
        )

    writer = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def probe_and_maintain_span_index(
    doc_stream: DataFrame,
    index_path: str,
    spans_out: str,
    checkpoint: str,
    min_len: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    partition_base: int = 1,
) -> StreamingQuery:
    """The full contamination loop at ingest: each micro-batch is
    PROBED against the standing anchor index first (which spans of the
    arrivals copy the corpus verbatim — written to ``spans_out`` under
    the batch's own idempotent partition, ready for span-cut or
    quarantine downstream), THEN its own distinct anchors are appended
    so later batches see it as corpus.  Probe-before-append means a
    batch never matches itself — the same batch-vs-standing semantics
    as ``span_cross_spans``, day over day.

    Replay safety: both writes are dynamic overwrites of the replayed
    ``batch_id`` partition, and the probe re-run sees exactly the
    pre-append index for that batch only if replay happens before the
    append committed — if the anchors landed but the span write did
    not, the re-probe ALSO matches the batch's own anchors, adding
    whole-document self-spans to the quarantine column.  Downstream
    span-cut treats them as harmless over-marking (the doc equals the
    corpus copy of itself); exactly-once consumers needing the strict
    pre-append answer should key on span length < document length.
    ``partition_base``: see :func:`maintain_span_index` — raise it
    above the index's current max ``batch_id`` when attaching a NEW
    checkpoint to prior history.
    """
    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        _span_anchors,
        span_probe_index,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        try:
            spans = span_probe_index(
                batch, spark, index_path,
                min_len=min_len, id_col=id_col, text_col=text_col,
            )
        except AnalysisException as e:
            # ONLY the missing-index bootstrap is a clean "no corpus
            # yet" — any other analysis error (bad columns, schema
            # drift) and every IO error must fail the batch loudly,
            # or contamination in it would be silently missed forever
            if not _is_missing_path(e):
                raise
            # derive the id type from the BATCH schema so the bootstrap
            # partition's parquet schema matches later batches' spans
            # (a hardcoded `long` diverged for string doc ids)
            id_type = batch.schema[id_col].dataType.simpleString()
            spans = batch.sparkSession.createDataFrame(
                [], f"{id_col} {id_type}, span_start long, span_len long"
            )
        (
            spans.withColumn(
                "batch_id", F.lit(partition_base + batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(spans_out)
        )
        (
            _span_anchors(batch, min_len, id_col, text_col)
            .select("h")
            .distinct()
            .withColumn(
                "batch_id", F.lit(partition_base + batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_path}/anchors")
        )

    writer = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
