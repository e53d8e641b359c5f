"""Sequence packing / document chunking: invariants a causal-LM batch
builder depends on, checked on hand-built corpora (not fixtures) so
boundary cases are exact."""

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_pipeline_spark.functions import packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_straddle(spark):
    # 3 docs x 4 tokens, seq_len 6: doc 1 straddles seqs 0/1, doc 2
    # straddles 1/... offsets 0,4,8 -> doc0 in seq0, doc1 in 0+1, doc2 in 1
    docs = _docs(spark, [(0, "a b c d"), (1, "e f g h"), (2, "i j k l")])
    out = packing.pack_sequences(docs, seq_len=6, bucket_docs=2)
    rows = {(r.doc_id, r.seq_id): r for r in out.collect()}
    assert set(rows) == {(0, 0), (1, 0), (1, 1), (2, 1)}
    assert rows[(1, 0)].tokens_in_seq == 2
    assert rows[(1, 1)].tokens_in_seq == 2
    assert rows[(1, 0)].offset_in_seq == 4
    assert rows[(1, 1)].offset_in_seq == 0
    assert rows[(2, 1)].offset_in_seq == 2


def test_pack_sequences_conservation(spark, sf_dir):
    """Every token lands in exactly one sequence: per-doc sum of
    tokens_in_seq == doc_tokens, and per-seq totals == seq_len except
    the last sequence."""
    from financial_data_ingestion_pipeline_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = packing.pack_sequences(docs, seq_len=512, bucket_docs=64).cache()
    try:
        per_doc = out.groupBy("doc_id", "doc_tokens").agg(
            F.sum("tokens_in_seq").alias("covered")
        )
        assert per_doc.filter(F.col("covered") != F.col("doc_tokens")).count() == 0
        per_seq = (
            out.groupBy("seq_id").agg(F.sum("tokens_in_seq").alias("fill"))
        )
        max_seq = per_seq.agg(F.max("seq_id")).first()[0]
        assert (
            per_seq.filter(
                (F.col("seq_id") < max_seq) & (F.col("fill") != 512)
            ).count()
            == 0
        )
    finally:
        out.unpersist()


def test_pack_sequences_empty_and_null_docs(spark):
    docs = _docs(spark, [(0, ""), (1, None), (2, "x y")])
    out = packing.pack_sequences(docs, seq_len=4)
    rows = out.collect()
    assert {r.doc_id for r in rows} == {2}
    assert rows[0].start_offset == 0  # empty docs occupy no offset


def test_pack_sequences_bucket_boundary_invariance(spark):
    """The two-level prefix sum is an implementation detail: bucket
    size must not change placement."""
    docs = _docs(spark, [(i, "t " * (i % 7 + 1)) for i in range(50)])
    a = packing.pack_sequences(docs, seq_len=16, bucket_docs=3)
    b = packing.pack_sequences(docs, seq_len=16, bucket_docs=1000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_chunk_documents_offsets_and_overlap(spark):
    text = "abcdefghij"  # 10 chars, chunk 4, overlap 2 -> starts 0,2,4,6,8
    docs = _docs(spark, [(7, text)])
    out = packing.chunk_documents(
        docs, chunk_chars=4, overlap=2, with_text=True
    ).orderBy("chunk_id")
    rows = out.collect()
    assert [r.chunk_start for r in rows] == [0, 2, 4, 6, 8]
    assert [r.chunk_text for r in rows] == ["abcd", "cdef", "efgh", "ghij", "ij"]
    assert [r.chunk_len for r in rows] == [4, 4, 4, 4, 2]
    # neighbouring chunks share exactly `overlap` chars
    assert rows[0].chunk_text[-2:] == rows[1].chunk_text[:2]


def test_chunk_documents_empty_and_invalid(spark):
    docs = _docs(spark, [(0, ""), (1, None)])
    assert packing.chunk_documents(docs, chunk_chars=4, overlap=1).count() == 0
    with pytest.raises(ValueError):
        packing.chunk_documents(docs, chunk_chars=4, overlap=4)


def test_batch_by_length_padding_and_determinism(spark, sf_dir):
    """Batches are length-contiguous within buckets (padding-minimal
    ordering), every batch except a bucket's last has exactly
    batch_size docs, and assignments are deterministic."""
    from financial_data_ingestion_pipeline_spark.functions import packing
    from financial_data_ingestion_pipeline_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = packing.batch_by_length(docs, batch_size=8, bucket_width=64)
    rows = out.collect()
    assert len(rows) == docs.count()

    by_batch = {}
    for r in rows:
        by_batch.setdefault((r.bucket, r.batch_idx), []).append(r)
    for (bucket, _), members in by_batch.items():
        for r in members:
            assert r.n_tokens // 64 == bucket
        assert len(members) <= 8
        assert sorted(r.pos_in_batch for r in members) == list(range(len(members)))
    # only the highest batch_idx per bucket may be ragged
    max_idx = {}
    for (bucket, bi), members in by_batch.items():
        max_idx[bucket] = max(max_idx.get(bucket, -1), bi)
    for (bucket, bi), members in by_batch.items():
        if bi < max_idx[bucket]:
            assert len(members) == 8
    # global order within bucket: batches partition the (n_tokens, id) sort
    for bucket in {b for b, _ in by_batch}:
        seq = sorted(
            (r for r in rows if r.bucket == bucket),
            key=lambda r: (r.batch_idx, r.pos_in_batch),
        )
        keys = [(r.n_tokens, r.doc_id) for r in seq]
        assert keys == sorted(keys)

    again = packing.batch_by_length(docs, batch_size=8, bucket_width=64).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_curriculum_order_is_total_and_monotone(spark, sf_dir):
    """global_pos is a permutation of 0..N-1, difficulty is
    non-decreasing along it, and stages are equal position slices."""
    from financial_data_ingestion_pipeline_spark.functions.packing import (
        curriculum_order,
    )
    from financial_data_ingestion_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        curriculum_order(docs).collect(), key=lambda r: r.global_pos
    )
    n = len(rows)
    assert [r.global_pos for r in rows] == list(range(n))
    diffs = [r.difficulty_millibits for r in rows]
    assert diffs == sorted(diffs)
    for r in rows:
        assert r.stage == (4 * r.global_pos) // n
