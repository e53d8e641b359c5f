"""Stream-static incremental dedup: filter an incoming document stream
against a STANDING corpus in-flight.

The batch counterpart is ``functions/dedup.py::dedup_incremental``;
this is its streaming front half — the exact-content check expressed as
a stream-static ANTI JOIN, the one Structured Streaming join shape that
needs no watermark and no state: each micro-batch probes the static
(16-bytes-per-doc) hash set and only novel documents flow on.  The
static side is re-planned per micro-batch, so a corpus table that
grows between batches (e.g. the sink of this very stream) is picked up
automatically — the standard dedup-at-ingest loop.

Near-duplicate (band-key) checks stay in the batch operator: flagging
"any band collides" per doc needs a per-doc aggregate after the join,
which append-mode streaming only allows with event-time state; at
ingest time the cheap exact gate runs in-flight and the near-dup sweep
runs on the landed novelty set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_novel_docs"]


def streaming_novel_docs(
    doc_stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append-mode stream of documents whose md5(text) does not appear
    in the static corpus.  Adds ``content_hash`` so the sink doubles as
    the next run's corpus hash set."""
    corpus_hashes = corpus.select(
        F.md5(F.col(text_col)).alias("content_hash")
    ).distinct()
    return doc_stream.withColumn(
        "content_hash", F.md5(F.col(text_col))
    ).join(corpus_hashes, "content_hash", "left_anti")
