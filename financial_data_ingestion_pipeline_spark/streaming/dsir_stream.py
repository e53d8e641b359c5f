"""Streaming DSIR scoring: importance-weight incoming documents
against a FROZEN fitted score table, in-flight.

The batch counterpart is ``functions/text.py::dsir_weights`` (fit +
score over one standing corpus); this is the ingest shape — fit once
on the standing corpus (``functions/text.py::dsir_score_table``, a
``buckets``-bounded constant table like the frozen BPE/PQ/IVF
artifacts), then score every arriving document STATELESSLY: the score
table becomes a SQL ``map(...)`` literal and the per-document weight
is an array-side fold over the row's own hashed n-grams — no explode,
no join, no state, no watermark.  A plain projection is the one
streaming shape that composes with anything (append mode, any sink,
any other stream op downstream), and it is exactly what
selection-at-ingest needs: each document is scored the moment it
arrives, against distributions that do NOT drift as the batch
boundary moves (the same frozen-quantizer invariant the streaming PQ
index relies on).

Buckets unseen at fit time score 0 — the add-one-smoothed ratio of
two empty counts — so novel vocabulary is neutral, not an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_dsir_scores"]


def streaming_dsir_scores(
    doc_stream: DataFrame,
    score_table: dict[int, int],
    n: int = 2,
    buckets: int = 1024,
    threshold_logw: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each arriving document with the frozen DSIR table.

    Output: id, n_feats, logw_q, selected (logw_q >= threshold) —
    n_feats/logw_q bit-identical to ``dsir_weights`` run over the same
    rows with the same fit corpus (stream/batch parity-tested).
    """
    from financial_data_ingestion_pipeline_spark.functions.text import (
        hash64,
        word_ngrams,
    )

    # One map literal, assembled as a single SQL string (one F.expr,
    # not 2*buckets py4j Column calls).  Sorted for a deterministic
    # plan; empty table degenerates to an always-0 lookup.
    if score_table:
        entries = ", ".join(
            f"{int(b)}L, {int(s)}L" for b, s in sorted(score_table.items())
        )
        lookup = f"coalesce(element_at(map({entries}), b), 0L)"
    else:
        lookup = "0L"
    grams = word_ngrams(F.coalesce(F.col(text_col), F.lit("")), n)
    bucketed = F.transform(
        grams, lambda g: F.pmod(hash64(g), F.lit(buckets))
    )
    scored = (
        doc_stream.withColumn("__bs", bucketed)
        .withColumn("n_feats", F.size("__bs").cast("long"))
        .withColumn(
            "logw_q",
            F.expr(
                f"aggregate(__bs, 0L, (acc, b) -> acc + {lookup})"
            ),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_feats",
        "logw_q",
        (F.col("logw_q") >= F.lit(int(threshold_logw))).alias("selected"),
    )
