"""Streaming maintenance of the materialized cross-dump overlap
postings (``functions/dedup.py::build_overlap_index``).

Documents arrive as a stream; each micro-batch shingles ITSELF (the
shared ``_source_posting`` kernel — distinct word-n-grams per source)
and lands its posting as its own ``batch_id=N`` partition.  Because
per-source shingle SETS are what the overlap matrix consumes, and set
union is associative, maintaining the index is a pure append: history
is never re-shingled, and ``source_overlap_from_index`` re-distincts
the unioned partitions at read time (an index-sized pass — grams the
batch shares with history collapse there).

Idempotence: a replayed micro-batch dynamic-overwrites ONLY its own
``batch_id`` partition, so at-least-once delivery can never inflate a
source's set beyond the read-time distinct.  This is the cheap daily
answer to "how much of today's dump is already in the corpus" —
merge, matrix, decide BEFORE committing to a full cross-dump dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["maintain_overlap_index"]


def maintain_overlap_index(
    doc_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
    available_now: bool = True,
    partition_base: int = 1,
) -> StreamingQuery:
    """Shingle each micro-batch and land its distinct ``(src, gram)``
    posting under an idempotent ``batch_id`` partition
    (layout-compatible with
    ``functions/dedup.py::build_overlap_index``).  Partition ids are
    ``partition_base + batch_id``: Spark restarts batch ids at 0 for a
    NEW checkpoint, so raise ``partition_base`` above the index's
    current max ``batch_id`` when attaching to prior history (else the
    new stream's dynamic overwrites would delete the old stream's
    partitions)."""
    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        _source_posting,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            _source_posting(batch, n, text_col, source_col)
            # partition_base offsets past batch_id=0 (the batch
            # builder's bootstrap) and any prior stream's partitions
            .withColumn(
                "batch_id", F.lit(partition_base + batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_path}/postings")
        )

    writer = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
