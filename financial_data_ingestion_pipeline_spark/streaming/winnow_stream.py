"""Streaming maintenance of the materialized winnow (MOSS)
fingerprint index.

Documents arrive as a stream; each micro-batch winnows ITSELF
(array-local, stateless — the same `_winnow_posting` kernel as the
batch builder) and lands its ``(doc, fp)`` posting rows in the index
as its own ``batch_id=N`` partition.  Fingerprint selection depends
only on the document's own text — nothing corpus-global to freeze —
so unlike the PQ index there is no quantizer invariant to carry; the
index stays exactly "the union of every document's posting rows" and
:func:`...functions.text.winnow_probe_index` needs no knowledge of
how it was built.

Idempotence: a replayed micro-batch dynamic-overwrites ONLY its own
``batch_id`` partition, so at-least-once delivery never duplicates
posting rows — duplicates would inflate every pair's ``n_shared``
and the probe cap's df counts.  This is the dedup-at-ingest loop for
local text overlap: winnow the arrivals in-flight, probe them against
the standing index, append the keepers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["maintain_winnow_index"]


def maintain_winnow_index(
    doc_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 5,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    partition_base: int = 1,
) -> StreamingQuery:
    """Winnow each micro-batch and land it in the index under an
    idempotent ``batch_id`` partition (layout-compatible with
    ``functions/text.py::build_winnow_index``).  Partition ids are
    ``partition_base + batch_id``: Spark restarts batch ids at 0 for a
    NEW checkpoint, so raise ``partition_base`` above the index's
    current max ``batch_id`` when attaching to prior history (else the
    new stream's dynamic overwrites would delete the old stream's
    partitions — both fingerprints AND the meta doc counts the probe
    cap depends on)."""
    from financial_data_ingestion_pipeline_spark.functions.text import (
        _winnow_posting,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            _winnow_posting(batch, k, w, id_col, text_col)
            # partition_base offsets past batch_id=0 (the batch
            # builder's bootstrap) and any prior stream's partitions
            .withColumn(
                "batch_id", F.lit(partition_base + batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_path}/fingerprints")
        )
        # keep the meta doc-count partition in lockstep (same
        # idempotent dynamic overwrite): the probe's df cap N counts
        # ALL corpus docs, fingerprint-less ones included, to stay
        # bit-identical to winnow_cross_pairs' corpus.count()
        (
            batch.select(F.count(F.lit(1)).alias("n_docs"))
            .withColumn(
                "batch_id", F.lit(partition_base + batch_id).cast("long")
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_path}/meta")
        )

    writer = (
        doc_stream.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
