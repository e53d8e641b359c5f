"""Semantic unit tests for the sketch / sampling / range-join operators
added for large-scale pipeline analytics (the oracle equality tests in
the driver contract cover the fixtures; these pin edge semantics on
hand-built data)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_data_ingestion_pipeline_spark.functions.sketches import (
    approx_distinct_kmv,
    countmin_estimate,
    countmin_sketch,
)
from financial_data_ingestion_pipeline_spark.functions.text import (
    sample_stratified,
)
from financial_data_ingestion_pipeline_spark.operators.analytics import (
    group_quantiles,
    pairs_within,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_group_quantiles_discrete_positions(spark):
    # 10 values 1..10: q50 -> ceil(5)=5th value, q90 -> 9th, q99 -> 10th
    rows = [("A", i, float(i)) for i in range(1, 11)] + [
        ("B", 1, 42.0),  # singleton group: every quantile is the value
        ("B", 2, None),  # NULL excluded, not sorted into a position
    ]
    df = spark.createDataFrame(rows, "sym string, id long, v double")
    out = {
        r.symbol: (r.q50, r.q90, r.q99)
        for r in group_quantiles(
            df, (0.5, 0.9, 0.99), symbol_col="sym", value_col="v", id_col="id"
        ).collect()
    }
    assert out["A"] == (5.0, 9.0, 10.0)
    assert out["B"] == (42.0, 42.0, 42.0)


def test_pairs_within_bucket_boundaries(spark):
    base = _ts("2024-01-01 00:00:00")
    rows = [
        # A: 0s, 59s (same bucket, 59 apart), 61s (adjacent bucket:
        # 2s from the 59s event, 61s from the 0s event -> NOT a pair
        # with the first), 200s (isolated)
        ("A", 1, base),
        ("A", 2, base + dt.timedelta(seconds=59)),
        ("A", 3, base + dt.timedelta(seconds=61)),
        ("A", 4, base + dt.timedelta(seconds=200)),
        # exactly 60s apart across buckets -> inclusive pair
        ("B", 5, base),
        ("B", 6, base + dt.timedelta(seconds=60)),
        # same instant -> pair, counted once
        ("C", 7, base),
        ("C", 8, base),
    ]
    df = spark.createDataFrame(rows, "sym string, id long, ts timestamp_ntz")
    out = {
        r.symbol: r.n_pairs
        for r in pairs_within(
            df, window_seconds=60, symbol_col="sym", ts_col="ts", id_col="id"
        ).collect()
    }
    # A: (1,2) 59s apart, (2,3) 2s apart; (1,3) is 61s -> excluded
    assert out == {"A": 2, "B": 1, "C": 1}


def test_kmv_estimate_tracks_cardinality(spark):
    rows = [("G", i % 200) for i in range(5000)] + [
        ("H", i % 10) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "g string, uid long")
    out = {
        r.g: (r.n_distinct_exact, r.n_distinct_est)
        for r in approx_distinct_kmv(df, ["g"], "uid", k=64).collect()
    }
    for g, (exact, est) in out.items():
        assert abs(est - exact) / exact < 0.5, (g, exact, est)
    # duplicates must not inflate the sketch: same distinct set, more
    # rows -> identical estimate (MIN is idempotent)
    doubled = df.unionAll(df)
    out2 = {
        r.g: r.n_distinct_est
        for r in approx_distinct_kmv(doubled, ["g"], "uid", k=64).collect()
    }
    assert out2 == {g: est for g, (_, est) in out.items()}


def test_countmin_never_undercounts_and_bounds_state(spark):
    # zipf-ish: term t_i appears 1000//(i+1) times
    rows = [(f"t{i}",) for i in range(100) for _ in range(1000 // (i + 1))]
    occ = spark.createDataFrame(rows, "term string")
    width, depth = 256, 4
    sk = countmin_sketch(occ, "term", width=width, depth=depth)
    assert sk.count() <= width * depth  # bounded state, any vocabulary
    exact = occ.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    est = {
        r.term: (r.n_exact, r.n_est)
        for r in countmin_estimate(
            sk, exact, "term", width=width, depth=depth
        ).collect()
    }
    assert len(est) == 100
    total = sum(1000 // (i + 1) for i in range(100))
    for term, (n_exact, n_est) in est.items():
        assert n_est >= n_exact, term  # CM never undercounts
        # loose CM bound: overcount << e/width * total with high prob
        assert n_est - n_exact <= 3 * total // width, (term, n_exact, n_est)


def test_sample_stratified_rates_and_determinism(spark):
    rows = [(i, f"t{i}", "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = sample_stratified(df, {"de": 1000, "en": 250}).select(
        "doc_id", "lang"
    )
    pdf = kept.toPandas()
    n_de = (pdf["lang"] == "de").sum()
    n_en = (pdf["lang"] == "en").sum()
    assert n_de == 1000  # rate 1000 permille keeps every de doc
    assert 150 < n_en < 350  # ~25% of 1000
    # unknown stratum with default 0 -> dropped entirely
    extra = spark.createDataFrame([(99999, "x", "xx")], df.schema)
    assert sample_stratified(extra, {"de": 1000}).count() == 0
    # partition-layout independence: same surviving ids after shuffle
    re_ids = sorted(
        r.doc_id
        for r in sample_stratified(df.repartition(13), {"de": 1000, "en": 250})
        .select("doc_id")
        .collect()
    )
    assert re_ids == sorted(pdf["doc_id"].tolist())


def test_quantile_hist_accuracy_within_bin_width(spark):
    """The histogram quantile estimate lands within one bin width of the
    exact quantile, and the sketch is insensitive to input partitioning
    (merge-correct partial counts)."""
    from financial_data_ingestion_pipeline_spark.functions.sketches import (
        approx_quantile_hist,
    )

    vals = [(i % 3, float((i * 37) % 1000)) for i in range(3000)]
    df = spark.createDataFrame(vals, "g int, v double")
    out = approx_quantile_hist(
        df, ["g"], "v", quantiles=[0.25, 0.5, 0.9], lo=0.0, hi=1000.0, n_bins=50
    )
    rows = out.collect()
    assert len(rows) == 9
    import numpy as np

    width = 1000.0 / 50
    by_g = {}
    for g, v in vals:
        by_g.setdefault(g, []).append(v)
    for r in rows:
        exact = float(np.quantile(np.array(by_g[r.g]), r.q))
        assert abs(r.est - exact) <= width + 1e-9, (r.g, r.q, r.est, exact)
    # repartitioning must not change a single bit of the estimates
    out2 = approx_quantile_hist(
        df.repartition(13), ["g"], "v",
        quantiles=[0.25, 0.5, 0.9], lo=0.0, hi=1000.0, n_bins=50,
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_quantile_hist_clamps_out_of_range(spark):
    from financial_data_ingestion_pipeline_spark.functions.sketches import (
        approx_quantile_hist,
    )

    df = spark.createDataFrame(
        [(0, -50.0), (0, 5.0), (0, 9999.0)], "g int, v double"
    )
    rows = approx_quantile_hist(
        df, ["g"], "v", quantiles=[0.5], lo=0.0, hi=100.0, n_bins=10
    ).collect()
    assert len(rows) == 1 and rows[0].n == 3
    assert 0.0 <= rows[0].est <= 100.0


def test_sample_temperature_upweights_small_strata(spark):
    """alpha=0.5: the smallest stratum keeps everything; a stratum 4x
    bigger keeps ~sqrt(1/4)=50%; output is deterministic under
    repartitioning."""
    from financial_data_ingestion_pipeline_spark.functions.text import (
        sample_temperature,
    )

    rows = [(i, "small") for i in range(250)] + [
        (1000 + i, "big") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_temperature(df, alpha=0.5)
    kept = out.groupBy("source").count().collect()
    by = {r.source: r["count"] for r in kept}
    assert by["small"] == 250  # rate 1000 permille
    assert 400 <= by["big"] <= 600  # ~500 expected, md5-bucket noise
    rates = {r.source: r.rate_permille for r in out.select("source", "rate_permille").distinct().collect()}
    assert rates["small"] == 1000 and rates["big"] == 500
    again = sample_temperature(df.repartition(17), alpha=0.5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_bloom_no_false_negatives_and_sparse(spark, sf_dir):
    """Probing the exact build set must flag EVERY key maybe_seen (the
    one-sided guarantee); the word table stays sparse (<= m/32 rows);
    and disjoint random keys mostly miss (false-positive rate sane)."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import sketches
    from financial_data_ingestion_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    bloom = sketches.bloom_build(docs, "text")
    assert bloom.count() <= (1 << 16) / 32
    self_probe = sketches.bloom_probe(docs, bloom, "text", "doc_id")
    n = docs.count()
    assert self_probe.filter(F.col("maybe_seen") == 1).count() == n
    # unseen keys: ids shifted out of the corpus id space
    fresh = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("UNSEEN::"), F.col("text")).alias("text"),
    )
    fp = sketches.bloom_probe(fresh, bloom, "text", "doc_id").filter(
        F.col("maybe_seen") == 1
    ).count()
    assert fp < 0.2 * n, f"false-positive rate implausible: {fp}/{n}"


def test_kmv_overlap_accuracy_on_known_sets(spark):
    """Disjoint and half-overlapping synthetic key sets: estimates
    within the ~1/sqrt(k) error band, intersection ~0 for disjoint."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import sketches

    a = spark.range(0, 2000).select(F.col("id").alias("ka"))
    b_disjoint = spark.range(10_000, 12_000).select(F.col("id").alias("kb"))
    r = sketches.kmv_overlap(a, "ka", b_disjoint, "kb", k=64).first()
    assert abs(r.n_a_est - 2000) / 2000 < 0.35
    assert abs(r.union_est - 4000) / 4000 < 0.35
    assert r.inter_est < 0.25 * 2000  # noise floor, far below a real overlap

    b_half = spark.range(1000, 3000).select(F.col("id").alias("kb"))
    r2 = sketches.kmv_overlap(a, "ka", b_half, "kb", k=64).first()
    assert abs(r2.union_est - 3000) / 3000 < 0.35
    assert 0.3 * 1000 < r2.inter_est < 2.2 * 1000


def test_kmv_overlap_empty_side_yields_nulls(spark):
    """An empty input side must propagate NULL estimates (one row, no
    crash) — the Column-expression behavior, preserved by the Arrow
    estimate kernel."""
    from financial_data_ingestion_pipeline_spark.functions.sketches import (
        kmv_overlap,
    )

    a = spark.createDataFrame([(i,) for i in range(10)], "k long")
    empty = spark.createDataFrame([], "k long")
    row = kmv_overlap(a, "k", empty, "k").collect()
    assert len(row) == 1
    assert row[0].n_a_est is not None
    assert row[0].n_b_est is None
    assert row[0].union_est is None and row[0].inter_est is None
