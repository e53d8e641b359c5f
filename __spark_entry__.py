"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 onto the
driver fixture tables (TESTDATA.md): ``events`` plays the tick-stream
role (event_type = symbol, ts = tick time, value = price), the TPC-H-ish
tables exercise joins/aggregations, and ``documents``/``embeddings``
serve the LLM-pipeline operators.  ``oracle_sql()`` holds the DuckDB
equivalent for each query.

Determinism contract (so value-hashes match bit-for-bit):
- open/close use min_by/max_by over a composite (ts, event_id) key —
  no positional ``first``/``last`` (SURVEY.md §2.9 Q1).
- every SUM over doubles is computed on DECIMAL (associative, shuffle-
  order independent) and cast back to double in BOTH engines.
- derived float metrics are ``round(x, 6)`` in BOTH engines.
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from financial_data_ingestion_pipeline_spark.functions import (  # noqa: E402
    dedup,
    multimodal,
    similarity,
    text,
)
from financial_data_ingestion_pipeline_spark.operators import (  # noqa: E402
    analytics,
    asof,
    ohlc,
    quality,
)
from financial_data_ingestion_pipeline_spark.schemas import (  # noqa: E402
    FIXTURE_TABLES,
)
from financial_data_ingestion_pipeline_spark.sources import load_table  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

# Two trading days guaranteed present in the events fixture (Jan 2024).
DATE_A, DATE_B = "2024-01-04", "2024-01-05"
TIE = ("event_id",)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's price-change query (dp:261-281) over the
    sf0.001 events fixture — conditional-aggregation pivot on two dates
    plus derived pct-change.  Unfiltered so the smoke check always has
    rows; the gated variant is ``queries()['price_change']``."""
    return analytics.price_change(
        _events(spark, SF_SMOKE),
        DATE_A,
        DATE_B,
        min_pct_change=None,
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
    )


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------

def _q_price_change(spark, sf_dir):
    return analytics.price_change(
        _events(spark, sf_dir), DATE_A, DATE_B, min_pct_change=3.0,
        symbol_col="event_type", ts_col="ts", price_col="value",
    )


def _q_daily_ohlc(spark, sf_dir):
    return ohlc.daily_ohlc(
        _events(spark, sf_dir), symbol_col="event_type", ts_col="ts",
        price_col="value", volume_col="value", tie_cols=TIE,
    )


def _q_hourly_ohlc(spark, sf_dir):
    return ohlc.bucketed_ohlc(
        _events(spark, sf_dir), "1 hour", symbol_col="event_type",
        ts_col="ts", price_col="value", tie_cols=TIE,
    )


def _q_resample_5min(spark, sf_dir):
    return ohlc.resample(
        _events(spark, sf_dir), "5minute",
        from_ts="2024-01-05 00:00:00", to_ts="2024-01-10 00:00:00",
        symbols=["click", "purchase"], symbol_col="event_type",
        ts_col="ts", price_col="value", tie_cols=TIE,
    )


def _q_events_clean(spark, sf_dir):
    from pyspark.sql import functions as F

    return _events(spark, sf_dir).select(
        "event_id",
        F.upper(F.regexp_replace("event_type", r"_v\d+$", "")).alias("symbol"),
        F.col("ts").alias("event_ts"),
        F.to_date("ts").alias("event_date"),
        F.expr("try_cast(get_json_object(props, '$.k') AS double)").alias("prop_k"),
        "value",
    )


def _dirty_lineitem(spark, sf_dir):
    """Deterministic ingest-dirt shim for the validity audits — the
    same manufactured-anomaly pattern as _q_calendar_fill's dropped
    days: the fixtures ship with ZERO invalid measures at every SF
    (so the audits certified 0 == 0, proving nothing), so ~0.1% of
    rows get a NULL l_quantity and another ~0.1% a negative l_tax,
    keyed on l_orderkey so the dirt rate is scale-invariant and the
    oracle replays it exactly."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    return li.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 1000 == 7,
               F.lit(None).cast("double"))
        .otherwise(F.col("l_quantity")),
    ).withColumn(
        "l_tax",
        F.when(F.col("l_orderkey") % 1000 == 13,
               F.lit(-1.0)).otherwise(F.col("l_tax")),
    )


def _q_invalid_rows(spark, sf_dir):
    li = _dirty_lineitem(spark, sf_dir)
    return quality.invalid_rows(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def _q_validity_summary(spark, sf_dir):
    li = _dirty_lineitem(spark, sf_dir)
    return quality.validity_summary(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"], "l_returnflag"
    )


def _q_missing_symbols(spark, sf_dir):
    """Anti-join audit with a manufactured gap (every fixture ships
    all 25 nations fully covered at every SF, so the raw audit
    certified 0 == 0): customers of nations where nationkey % 7 == 3
    are dropped in-flight, leaving exactly those nations 'missing' —
    scale-invariant, oracle-replayable."""
    from pyspark.sql import functions as F

    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") % 7 != 3
    )
    return quality.missing_symbols(nation, customer, "n_nationkey", "c_nationkey")


def _q_ohlc_reconcile(spark, sf_dir):
    from pyspark.sql import functions as F

    day = _events(spark, sf_dir).filter(F.to_date("ts") == F.lit("2024-01-15").cast("date"))
    golden = (
        ohlc.daily_ohlc(day, symbol_col="event_type", ts_col="ts",
                        price_col="value", tie_cols=TIE)
        .select(
            F.col("symbol").alias("SYMBOL"),
            F.col("open").alias("OPEN"),
            F.col("high").alias("HIGH"),
            F.col("low").alias("LOW"),
            F.col("close").alias("CLOSE"),
        )
    )
    return quality.ohlc_reconciliation(
        day, golden, symbol_col="event_type", ts_col="ts",
        price_col="value", tie_cols=TIE,
    )


def _q_asof_hourly_close(spark, sf_dir):
    """As-of join: each event tagged with its symbol's most recent
    hourly close at-or-before the event time (one shuffle+sort, no
    range-join explosion — operators/asof.py)."""
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    hourly = ohlc.bucketed_ohlc(
        e, "1 hour", symbol_col="event_type", ts_col="ts",
        price_col="value", tie_cols=TIE,
    ).select("symbol", "bucket_start", "close")
    left = e.select(
        F.col("event_type").alias("symbol"), "ts", "event_id", "value"
    )
    return asof.asof_join_backward(
        left, hourly, by=["symbol"], left_ts="ts",
        right_ts="bucket_start", value_cols=["close"],
    ).select("symbol", "ts", "event_id", "value", F.col("close").alias("hourly_close"))


def _q_asof_next_close(spark, sf_dir):
    """Forward as-of join: each event tagged with the close of the
    EARLIEST hourly bucket starting at-or-after the event time
    (pandas merge_asof(direction='forward') semantics — same
    single-shuffle union+window plan with the frame flipped)."""
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    hourly = ohlc.bucketed_ohlc(
        e, "1 hour", symbol_col="event_type", ts_col="ts",
        price_col="value", tie_cols=TIE,
    ).select("symbol", "bucket_start", "close")
    left = e.select(
        F.col("event_type").alias("symbol"), "ts", "event_id", "value"
    )
    return asof.asof_join_forward(
        left, hourly, by=["symbol"], left_ts="ts",
        right_ts="bucket_start", value_cols=["close"],
    ).select(
        "symbol", "ts", "event_id", "value",
        F.col("close").alias("next_close"),
    )


def _q_asof_hourly_close_skew(spark, sf_dir):
    """The de-skewed as-of plan ((symbol, day-bucket) window + carry
    table) must produce the IDENTICAL result — same oracle as
    asof_hourly_close, different physical strategy."""
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    hourly = ohlc.bucketed_ohlc(
        e, "1 hour", symbol_col="event_type", ts_col="ts",
        price_col="value", tie_cols=TIE,
    ).select("symbol", "bucket_start", "close")
    left = e.select(
        F.col("event_type").alias("symbol"), "ts", "event_id", "value"
    )
    return asof.asof_join_backward(
        left, hourly, by=["symbol"], left_ts="ts",
        right_ts="bucket_start", value_cols=["close"],
        skew_bucket="1 day",
    ).select("symbol", "ts", "event_id", "value", F.col("close").alias("hourly_close"))


def _q_distinct_symbols(spark, sf_dir):
    return _events(spark, sf_dir).select("event_type").distinct()


def _q_event_sessions(spark, sf_dir):
    """Per-USER activity sessions (30-min inactivity gap).  Keyed by
    user, not event_type: users scale WITH the corpus while per-user
    event density stays constant, so session structure survives any
    scale-up — a per-type key collapses to a handful of month-long
    mega-sessions as soon as the stream is dense (observed 2481 -> 5
    rows from sf0.01 to sf0.1)."""
    return analytics.sessionize(
        _events(spark, sf_dir), gap="30 minutes",
        symbol_col="user_id", ts_col="ts", value_col="value",
    )


def _q_event_transitions(spark, sf_dir):
    """Markov user-journey matrix: consecutive-event transitions per
    user with exact integer-ppm probabilities; one window shuffle,
    vocabulary-sized aggregate."""
    return analytics.event_transitions(_events(spark, sf_dir))


def _q_max_drawdown(spark, sf_dir):
    """Risk analytics: per-symbol worst peak-to-trough drawdown over
    the running maximum, deterministic trough argmin."""
    return analytics.max_drawdown(_events(spark, sf_dir))


def _q_calendar_fill(spark, sf_dir):
    """Daily spine + forward fill: drop every 5th calendar day to
    manufacture gaps, then fill per-symbol closes across them."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir).filter(F.dayofmonth("ts") % 5 != 0)
    return analytics.fill_daily_gaps(ev)


def _q_pattern_match(spark, sf_dir):
    """CEP negation pattern: purchase after click within 1 hour with
    NO error between — two ignorenulls windows, one shuffle, no
    self-join (the MATCH_RECOGNIZE staple Spark lacks natively)."""
    return analytics.pattern_match(
        _events(spark, sf_dir), first="click", second="purchase",
        without="error", gap="1 hour",
    )


def _q_k_anonymity(spark, sf_dir):
    """Privacy governance: quasi-identifier equivalence classes with
    BELOW-MEAN population on (nation, market segment, balance band) —
    the re-identification audit before a customer-table release.
    Adaptive k (mean class size, exact cross-multiplied integers)
    instead of a constant: a fixed k=10 flags everything at small SFs
    and nothing once classes outgrow it (0 rows at the heaps1 decade
    certified nothing)."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "balance_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return quality.k_anonymity(
        cust, ["c_nationkey", "c_mktsegment", "balance_band"], k=None
    )


def _q_active_users(spark, sf_dir):
    """Exact DAU/WAU with integer-ppm stickiness: distinct user-day
    collapse, bounded 7-day fan-out, cascaded aggregates."""
    return analytics.active_user_counts(_events(spark, sf_dir), window_days=7)


def _q_rolling_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    return analytics.rolling_stats(
        analytics.filter_between(
            _events(spark, sf_dir), "2024-01-10 00:00:00", "2024-01-12 00:00:00",
            ts_col="ts",
        ),
        window_seconds=600,
        symbol_col="event_type", ts_col="ts", value_col="value",
        id_cols=("event_id",),
    )


def _q_group_quantiles(spark, sf_dir):
    return analytics.group_quantiles(
        _events(spark, sf_dir), quantiles=(0.5, 0.9, 0.99),
        symbol_col="event_type", value_col="value", id_col="event_id",
    )


def _q_event_pairs(spark, sf_dir):
    return analytics.pairs_within(
        _events(spark, sf_dir), window_seconds=60,
        symbol_col="event_type", ts_col="ts", id_col="event_id",
    )


def _q_anomaly_flags(spark, sf_dir):
    """Rolling z-score outliers: events more than 2 standard deviations
    from their symbol's trailing-200-observation mean."""
    return analytics.anomaly_flags(
        _events(spark, sf_dir),
        window_rows=200,
        z_thresh=2.0,
        min_n=50,
        symbol_col="event_type",
        ts_col="ts",
        value_col="value",
        id_cols=("event_id",),
    )


def _q_expectations_report(spark, sf_dir):
    """Declarative data-quality gate over the event stream: five
    expectations checked in ONE scan (conditional sums -> stack
    unpivot), violations in exact integer ppm.  NULL predicate
    results count as violations — unknown is not passing."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    rules = [
        ("value_nonnegative", F.col("value") >= 0),
        ("value_below_cap", F.col("value") <= 450),
        ("ts_present", F.col("ts").isNotNull()),
        ("user_present", F.col("user_id").isNotNull()),
        (
            "event_type_known",
            F.col("event_type").isin(
                "click", "error", "purchase", "signup", "view"
            ),
        ),
    ]
    return quality.expect_report(ev, rules, max_violation_frac=0.10)


def _q_daily_event_pivot(spark, sf_dir):
    """Relational pivot through Spark's native ``pivot()`` (the Pivot
    logical node, not hand-rolled conditional aggs): per-day event
    counts as one column per event type.  The value list is explicit,
    so the plan needs no distinct-scan pre-pass and the output schema
    is static — the form that scales (implicit pivot collects the key
    domain to the driver)."""
    from pyspark.sql import functions as F

    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        _events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
        )
    )


def _q_ewma_prices(spark, sf_dir):
    """Half-life exponential smoothing per event stream: truncated
    8-term EWMA whose power-of-two weights make every product exact
    and whose normalizer corrects short leading histories — the
    engine-reproducible form of the classic recursive filter."""
    return analytics.ewma_smooth(
        _events(spark, sf_dir),
        depth=8,
        symbol_col="event_type", ts_col="ts", value_col="value",
        id_cols=("event_id",),
    )


def _q_range_buckets(spark, sf_dir):
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import sketches

    return sketches.range_bucket_assign(
        _events(spark, sf_dir).select("event_id", "value"),
        "value", n_buckets=8, lo=0.0, hi=500.0, n_bins=64,
    ).select(
        "event_id", "value", F.col("_bin").cast("long").alias("bin"), "bucket"
    )


def _q_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering diagnostic on lineitem's two join
    dimensions: each of the 16 z-range buckets covers a bounded
    rectangle in BOTH (l_partkey, l_suppkey) — the property that lets
    file min/max stats prune scans on either column after an
    OPTIMIZE-ZORDER-style rewrite."""
    from financial_data_ingestion_pipeline_spark.operators import warehouse

    return warehouse.zorder_stats(
        load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey", bits=8, bucket_bits=4,
    )


def _q_split_by_domain(spark, sf_dir):
    """Leakage-safe split: the hash bucket is keyed on the DOMAIN, so
    every document from one source lands in the same split — near-dups
    within a site can never straddle train/test (the
    contamination-through-split failure mode of doc-keyed splits)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    assignment = text.split_assign(
        docs.select("source").distinct(), id_col="source", seed="domsplit"
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(assignment.select("source", "split")), "source")
        .select("doc_id", "source", "split")
    )


def _q_join_cardinality_estimate(spark, sf_dir):
    """Pre-join sizing: how many customers actually appear in orders?
    Answered from two KMV sketches + inclusion-exclusion — no join
    executed, both engines replay the identical estimate."""
    from financial_data_ingestion_pipeline_spark.functions import sketches

    return sketches.kmv_overlap(
        load_table(spark, sf_dir, "orders"), "o_custkey",
        load_table(spark, sf_dir, "customer"), "c_custkey",
    )


def _q_bloom_dedup_probe(spark, sf_dir):
    """Ingest-time membership pre-filter: Bloom over yesterday's corpus
    (even ids), probed by today's batch (odd ids) — clean misses skip
    the exact dedup join entirely."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import sketches

    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    probe = docs.filter(F.col("doc_id") % 2 == 1)
    bloom = sketches.bloom_build(seen, "text")
    return sketches.bloom_probe(probe, bloom, "text", "doc_id")


def _q_copurchase_pairs(spark, sf_dir):
    return analytics.copurchase_pairs(
        load_table(spark, sf_dir, "lineitem"), min_support=2, max_basket=32
    )


def _q_association_rules(spark, sf_dir):
    """Association-rule mining on the co-purchase pairs: directional
    confidence and lift in exact integer ppm (floor division — no
    float, engine-replayable).  Item supports come from the SAME
    bounded basket set as the pair supports, so the probabilities are
    consistent."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    # ONE shared basket universe: supports, basket total, and pair
    # supports all derive from the same bounded frame, so the cap can
    # never drift between a probability's numerator and denominator.
    # Materialized once — it has THREE consumers (item supports, the
    # basket total, the pair generator), and without a materialization
    # each one replays the collect_set aggregation over the fact table.
    # pin/persist rather than localCheckpoint (round 12): checkpoint
    # blocks hang off the RDD object, so a rebuilt query re-checkpoints
    # from scratch and nothing can evict them at the query boundary;
    # the DISK_ONLY pin goes through the CacheManager (steady-state
    # runs of the same plan reuse it — the round-7 measured 2x) and
    # session.evict_persisted releases it.  Same executor-storage
    # footprint class as the checkpoint it replaces (DISK_ONLY vs the
    # checkpoint's MEMORY_AND_DISK), lineage kept.
    from financial_data_ingestion_pipeline_spark.materialize import pin

    bounded = pin(
        analytics.bounded_baskets(li, max_basket=32),
        mode="persist",
        eager=False,
    )
    item_support = (
        bounded.select(F.explode("_items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_n"))
    )
    n_baskets = bounded.select(F.count(F.lit(1)).alias("__nb"))
    pairs = analytics.copurchase_pairs(
        li, min_support=2, max_basket=32, baskets=bounded
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "support",
        )
    )
    return (
        both.join(
            F.broadcast(
                item_support.select(
                    F.col("item").alias("item_a"), F.col("item_n").alias("n_a")
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                item_support.select(
                    F.col("item").alias("item_b"), F.col("item_n").alias("n_b")
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "support",
            F.expr("(support * 1000000) div n_a").alias("confidence_ppm"),
            F.expr(
                "(support * __nb * 1000000) div (n_a * n_b)"
            ).alias("lift_ppm"),
        )
    )


def _q_event_concentration(spark, sf_dir):
    """Per-user behavioral concentration: Herfindahl index of the
    event-type mix in exact integer ppm — Σ share_i² without a single
    float or log (the entropy alternative needs libm).  1e6 ppm =
    single-minded user; 2e5 = uniform over the five types."""
    from pyspark.sql import functions as F

    counts = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("c") * F.col("c")).alias("__ss"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.expr("(__ss * 1000000) div (n_events * n_events)").alias(
                "herfindahl_ppm"
            ),
        )
    )


def _q_customer_hierarchy(spark, sf_dir):
    """Hierarchy resolution by pointer jumping: a synthetic decimal
    parent tree over custkeys (parent = key div 10, root 0) resolves
    every node's root and depth in ceil(log2 depth) self-joins — the
    distributed answer to WITH RECURSIVE, which the oracle uses."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import graph

    edges = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("child"),
        F.expr("c_custkey div 10").alias("parent"),
    )
    return graph.tree_depths(edges, max_depth=8)


def _q_triangle_counts(spark, sf_dir):
    """Per-node triangle counts over the co-purchase graph via degree
    orientation (out-degree bounded by O(sqrt(E)) even at hub nodes).
    The oracle enumerates the same triangle set with the naive
    three-way join — orientation changes the traversal, never the
    answer, so the counts must match exactly.

    Graph density is SCALE-FREE by construction: a deterministic 10%
    basket subgraph (orderkey % 10) at min_support=1.  The old
    support>=2 edge set was a random-collision artifact whose absolute
    size stays ~3.4k edges at ANY corpus size — triangles vanish as
    the part vocabulary grows (0 at the heaps1 decade certified
    nothing).  Support-1 within-basket pairs keep constant average
    degree as baskets and parts scale together, so triangle structure
    (and the operator's wedge work per node) is invariant across SFs;
    the basket sample just sets the density constant."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import graph

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 10 == 0
    )
    pairs = analytics.copurchase_pairs(li, min_support=1, max_basket=32)
    return graph.triangle_count(pairs)


def _q_pagerank_items(spark, sf_dir):
    """Integer PageRank over the co-purchase graph — the iterative-
    algorithm showcase: 3 exact integer rounds, every unit replayable
    by the unrolled SQL oracle."""
    from financial_data_ingestion_pipeline_spark.functions import graph

    edges = analytics.copurchase_pairs(
        load_table(spark, sf_dir, "lineitem"), min_support=2, max_basket=32
    )
    return graph.pagerank(edges, iters=3)


def _q_fuzzy_name_pairs(spark, sf_dir):
    return quality.fuzzy_match_pairs(
        load_table(spark, sf_dir, "part"), "p_name", max_dist=3
    )


def _q_kmv_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import sketches

    return sketches.approx_distinct_kmv(
        _events(spark, sf_dir).select(
            F.col("event_type").alias("symbol"), "user_id"
        ),
        group_cols=["symbol"],
        value_col="user_id",
        k=32,
    )


SAMPLE_RATES_PERMILLE = {"en": 300, "zh": 500, "de": 1000, "es": 1000, "fr": 1000}


def _q_sample_stratified(spark, sf_dir):
    return text.sample_stratified(
        load_table(spark, sf_dir, "documents"), SAMPLE_RATES_PERMILLE
    )


def _q_winnow_fingerprints(spark, sf_dir):
    return text.winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def _q_winnow_overlap_pairs(spark, sf_dir):
    return text.winnow_overlap_pairs(load_table(spark, sf_dir, "documents"))


def _q_winnow_probe(spark, sf_dir):
    """Ingest-batch-vs-corpus winnow overlap (recompute form; the
    indexed/streaming variants are parity-tested in pytest): docs with
    id % 10 == 7 play the incoming batch, the rest the corpus."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return text.winnow_cross_pairs(
        docs.filter(F.col("doc_id") % 10 == 7),
        docs.filter(F.col("doc_id") % 10 != 7),
    )


DSIR_TARGET_SOURCES = ("src0", "src1", "src2")


def _q_dsir_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    w = text.dsir_weights(
        load_table(spark, sf_dir, "documents"), DSIR_TARGET_SOURCES
    )
    return w.orderBy(F.desc("logw_q"), "doc_id").limit(100)


def _q_date_in_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    return (
        analytics.filter_date_in(_events(spark, sf_dir), [DATE_A, DATE_B], ts_col="ts")
        .groupBy(F.col("event_type").alias("symbol"), F.to_date("ts").alias("trade_date"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _q_between_sum(spark, sf_dir):
    from pyspark.sql import functions as F

    return (
        analytics.filter_between(
            _events(spark, sf_dir), "2024-01-10 00:00:00", "2024-01-20 00:00:00", ts_col="ts"
        )
        .groupBy(F.col("event_type").alias("symbol"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("total_value"),
        )
    )


def _q_union_extremes(spark, sf_dir):
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    hi = e.filter(F.col("value") > 400).select("event_id", "event_type", "value")
    lo = e.filter(F.col("value") < 1).select("event_id", "event_type", "value")
    return (
        hi.unionByName(lo)
        .groupBy(F.col("event_type").alias("symbol"))
        .agg(F.count(F.lit(1)).alias("n_extreme"))
    )


def _q_top_events(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(F.col("event_type").alias("symbol"), "rank", "event_id", "value")
    )


def _q_revenue_by_nation(spark, sf_dir):
    """Multi-way join: orders x customer (shuffle) x nation (broadcast),
    decimal-summed revenue per nation per order-year."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_revenue"),
        )
    )


def _q_tpch_q1(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3))
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + dec("l_tax", 3))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("_sq"),
            F.sum(dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # every output number is an EXACT integer at the column's
        # natural decimal scale (cents / 1e-4 / 1e-6 units), averages
        # as floor(1e6*sum/n) integer division.  The former
        # rounded-double averages sat on a 6-dp half-boundary at
        # heaps1 cardinalities, and the double CASTS of the exact
        # charge sums diverged by 1 ulp between engines at 2e10
        # magnitude — integers have no such seams.
        .select(
            "l_returnflag", "l_linestatus",
            F.expr("CAST(CAST(_sq * 100 AS DECIMAL(38,0)) AS BIGINT)")
            .alias("sum_qty_cents"),
            F.expr("CAST(CAST(_sbp * 100 AS DECIMAL(38,0)) AS BIGINT)")
            .alias("sum_base_price_cents"),
            F.expr("CAST(CAST(_sdp * 10000 AS DECIMAL(38,0)) AS BIGINT)")
            .alias("sum_disc_price_e4"),
            F.expr("CAST(CAST(_sc * 1000000 AS DECIMAL(38,0)) AS BIGINT)")
            .alias("sum_charge_e6"),
            "count_order",
            F.expr(
                "CAST(CAST(_sq * 1000000 AS DECIMAL(38,0))"
                " DIV count_order AS BIGINT)"
            ).alias("avg_qty_micro"),
            F.expr(
                "CAST(CAST(_sbp * 1000000 AS DECIMAL(38,0))"
                " DIV count_order AS BIGINT)"
            ).alias("avg_price_micro"),
        )
    )


def _q_tpch_q6(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 3))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast into a fact join,
    then a top-k.  The BUILDING-segment customer slice is broadcast —
    the orders->lineitem join shuffles on the shared orderkey only."""
    from pyspark.sql import functions as F

    cutoff = F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3)
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_event_props(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.operators import cleaning

    return cleaning.parse_event_props(_events(spark, sf_dir)).select(
        "event_id", "event_type", "k"
    )


def _q_big_spenders(spark, sf_dir):
    """TPC-H Q18 shape: agg-derived key set (orders whose total quantity
    exceeds a threshold) joined back into orders x customer.  The
    keyset agg is a partial-agg-friendly sum on the join key itself, so
    the subsequent orderkey join reuses the same hash partitioning —
    one shuffle of lineitem, AQE-broadcast of the tiny survivor set."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select(
            F.col("l_orderkey").alias("_okey"),
            F.col("_qty").cast("double").alias("total_qty"),
        )
    )
    return (
        orders.join(qty, orders["o_orderkey"] == qty["_okey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


def _q_late_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join with a non-equi residual — count
    orders per priority having at least one line shipped >90 days after
    the order date, within one order-date quarter.  The date filter
    prunes the probe side before the shuffle; the semi-join never
    duplicates orders however many lines match."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def _q_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: global conditional-aggregate ratio over a fact x
    dim join (share of March-1997 revenue from ECONOMY-type parts).
    The ratio is published as integer parts-per-million computed from
    exact decimal-unit sums — no float rounding boundary for engines to
    disagree on — alongside the double revenues."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    agg = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "ECONOMY", rev)).alias("_promo"),
            F.sum(rev).alias("_total"),
            F.sum(F.when(F.col("p_type") == "ECONOMY", 1).otherwise(0))
            .cast("long")
            .alias("n_promo_items"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    promo_units = (F.coalesce(F.col("_promo"), F.lit(0)) * 10000).cast("long")
    total_units = (F.col("_total") * 10000).cast("long")
    return agg.select(
        "n_promo_items",
        "n_items",
        F.coalesce(F.col("_promo"), F.lit(0)).cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        (F.lit(1000000) * promo_units).alias("_pm_num"),
        total_units.alias("_pm_den"),
    ).select(
        "n_promo_items",
        "n_items",
        "promo_revenue",
        "total_revenue",
        F.expr("_pm_num div _pm_den").alias("promo_ppm"),
    )


def _q_top_orders_per_customer(spark, sf_dir):
    """Partitioned top-k: each customer's 3 most valuable orders via
    row_number.  Spark 3.5+ rewrites the rank-filter into a
    WindowGroupLimit (per-partition top-k before the shuffle), so the
    full sort never materializes — the scalable form of per-group
    LIMIT."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


def _q_funnel(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.operators import analytics

    return analytics.funnel(
        _events(spark, sf_dir), ["view", "click", "purchase"]
    )


def _q_retention_cohorts(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.operators import analytics

    return analytics.retention_cohorts(_events(spark, sf_dir))


def _q_sample_temperature(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions import text as text_fns

    return text_fns.sample_temperature(
        load_table(spark, sf_dir, "documents"), alpha=0.5
    )


def _q_dedup_incremental(spark, sf_dir):
    """New-batch-vs-corpus dedup: docs with id % 10 == 7 play the
    incoming batch; the rest are the standing corpus.  Both sides are
    id-splits of the same table, so the split form computes the
    signature aggregate once over the shared scan (parity with
    dedup_incremental(batch, corpus) tested in
    tests/test_functions.py::test_dedup_incremental_split_parity)."""
    from financial_data_ingestion_pipeline_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_incremental_split(docs, lambda c: c % 10 == 7)


def _q_corpus_cube(spark, sf_dir):
    """All 2^2 grouping sets in one pass: CUBE(lang, source) adds the
    per-lang marginal that ROLLUP's hierarchy lacks — the full
    contingency table for a corpus-mixture report, still one
    partial-agg shuffle (Spark expands the sets map-side)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            "n_docs",
            "total_chars",
        )
    )


def _q_order_percentiles(spark, sf_dir):
    """Analytic rank functions over a unique total ordering:
    percent_rank / cume_dist / quartile of each order's price within
    its priority class.  The (price, key) tiebreaker makes every
    function deterministic — ntile is position-dependent, so a
    non-unique ordering would be engine-dependent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def _q_corpus_rollup(spark, sf_dir):
    """Hierarchical totals in one pass: ROLLUP(source, lang) gives
    per-(source, lang), per-source, and grand-total document counts
    without re-scanning — Spark expands grouping sets inside a single
    partial-agg shuffle.  NULL grouping keys are projected to '<all>'
    (fixture keys are non-null, so the sentinel is unambiguous)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            "n_docs",
            "total_chars",
        )
    )


def _q_coverage_reconcile(spark, sf_dir):
    """Full-outer reconciliation of two event feeds (even vs odd users,
    the odd side thinned to rare high-value events so unmatched groups
    exist on both sides): coalesced keys, zero-filled counts, and a
    presence flag — the audit-join shape for comparing two pipelines'
    outputs."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    day = F.to_date("ts").alias("day")
    a = (
        ev.filter(F.col("user_id") % 2 == 0)
        .groupBy("event_type", day)
        .agg(F.count(F.lit(1)).alias("n_even"))
    )
    b = (
        ev.filter((F.col("user_id") % 2 == 1) & (F.col("value") > 450))
        .groupBy("event_type", day)
        .agg(F.count(F.lit(1)).alias("n_odd"))
    )
    joined = a.join(b, ["event_type", "day"], "full_outer")
    return joined.select(
        "event_type",
        "day",
        F.coalesce(F.col("n_even"), F.lit(0)).alias("n_even"),
        F.coalesce(F.col("n_odd"), F.lit(0)).alias("n_odd"),
        (F.col("n_even").isNotNull() & F.col("n_odd").isNotNull()).alias("in_both"),
    )


def _q_quantile_sketch(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions import sketches

    return sketches.approx_quantile_hist(
        _events(spark, sf_dir),
        ["event_type"],
        "value",
        quantiles=[0.5, 0.9, 0.99],
        lo=0.0,
        hi=512.0,
        n_bins=64,
    )


def _q_supplier_balance_by_region(spark, sf_dir):
    """Star-schema rollup through two fixed-cardinality dims: supplier
    x nation (25 rows) x region (5 rows).  Both dims are broadcast —
    at ANY corpus scale these joins stay shuffle-free because nation
    and region have bounded cardinality by construction."""
    from pyspark.sql import functions as F

    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.count_distinct("n_nationkey").alias("n_nations"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_balance"),
            F.min("s_acctbal").alias("min_balance"),
            F.max("s_acctbal").alias("max_balance"),
        )
    )


def _q_table_profile(spark, sf_dir):
    """ANALYZE-style single-pass column profile of the events table."""
    from financial_data_ingestion_pipeline_spark.operators import quality

    return quality.table_profile(
        _events(spark, sf_dir),
        ["event_id", "user_id", "event_type", "value", "props"],
    )


def _q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between two nations per year —
    the fact table joins TWO independent dimension chains (supplier
    nation and customer nation via orders), both broadcast, with the
    nation-pair disjunction applied post-join and the rollup keyed on
    (supp_nation, cust_nation, year)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    volume = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3)
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(volume).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _q_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter — a 4-table join (lineitem x orders x customer
    x nation) where the order-date filter prunes orders BEFORE the fact
    join, the two dims broadcast, and the final rank runs on the
    customer-sized aggregate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3)
    )
    q_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    agg = (
        li.filter(F.col("l_returnflag") == "R")
        .join(q_orders, li["l_orderkey"] == q_orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    # bounded: global window over the per-customer aggregate (customer-
    # dim-sized, post-groupBy), immediately rank-filtered to 20 rows
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("rank", "c_custkey", "c_name", "n_name", "revenue", "n_lines")
    )


def _q_brand_promo_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjunctions.  The join stays a single p_partkey equi-join (the
    disjunction is a post-join filter Catalyst pushes into both scans
    where single-sided) — the trap shape where a naive planner forms
    one join per disjunct or a cartesian."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3)
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


def _q_scd2_history(spark, sf_dir):
    """Type-2 SCD build over the events update stream: one window per
    (event_type, user_id), lead-closed validity intervals."""
    return analytics.scd2_history(_events(spark, sf_dir))


def _q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers above a GLOBAL scalar threshold (the
    positive-balance average) who have placed no orders, rolled up per
    nation.  The threshold rides as a broadcast 1-row frame and the
    comparison is cross-multiplied in exact DECIMAL
    (``bal * n > sum``) — no float average ever exists, so no customer
    can sit on an engine-dependent rounding boundary.  Dormancy ("no
    order since 2000-01-01") is a left anti-join against the order
    scan with the date predicate PUSHED INTO the scan and the
    projection pruned to custkey; at scale AQE picks broadcast vs
    shuffle side by the surviving customer count."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(dec).alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    rich = cust.crossJoin(F.broadcast(thr)).filter(
        dec * F.col("__n") > F.col("__s")
    )
    recent = orders.filter(
        F.col("o_orderdate")
        >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    idle = rich.join(
        recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(dec).cast("double").alias("totacctbal"),
    )


def _q_value_streaks(spark, sf_dir):
    """Gaps-and-islands: per (event_type, user_id), consecutive runs of
    rising/falling/flat value moves.  Two stacked windows over ONE
    partitioning — lag to classify each move, then a cumulative
    change-flag sum to number the islands — so the whole thing is a
    single shuffle and a single sort; (event_type, user_id) keys keep
    partitions small at any scale."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("event_type", "user_id", "ts", "event_id", "value")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    moves = ev.withColumn("_prev", F.lag("value").over(w)).withColumn(
        "direction",
        F.when(F.col("_prev").isNull(), None)
        .when(F.col("value") > F.col("_prev"), "up")
        .when(F.col("value") < F.col("_prev"), "down")
        .otherwise("flat"),
    )
    changed = F.when(
        F.col("direction").isNull()
        | (F.col("direction") != F.coalesce(F.lag("direction").over(w), F.lit(""))),
        1,
    ).otherwise(0)
    streaks = (
        moves.withColumn("_new_streak", changed)
        .withColumn("streak_id", F.sum("_new_streak").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
        .filter(F.col("direction").isNotNull())
        .groupBy("event_type", "user_id", "direction", "streak_id")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    return streaks.groupBy("event_type", "direction").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("_len").alias("max_len"),
        F.sum("_len").alias("total_moves"),
    )


def _q_pack_sequences(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions import packing

    return packing.pack_sequences(
        load_table(spark, sf_dir, "documents"), seq_len=1024, bucket_docs=128
    )


def _q_chunk_documents(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions import packing

    return packing.chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_chars=256, overlap=32
    )


def _q_length_batches(spark, sf_dir):
    """Length-bucketed training batches: deterministic (bucket,
    batch_idx, pos) assignment minimizing padding waste, ranked by a
    two-level scan (no single-task global sort)."""
    from financial_data_ingestion_pipeline_spark.functions import packing

    return packing.batch_by_length(
        load_table(spark, sf_dir, "documents"), batch_size=8, bucket_width=64
    )


def _q_shuffle_order(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions import packing

    return packing.shuffle_order(
        load_table(spark, sf_dir, "documents"), seed="epoch0", n_shards=16
    )


# --- LLM-pipeline operators (north star) ------------------------------------

KNN_QUERY_IDS = list(range(10))

# Query vectors memoized per scale factor: in a serving deployment the
# query batch arrives as vectors, so repeated top-k calls shouldn't pay
# a corpus-scan job each just to re-fetch 10 rows (the first call per
# sf_dir pays one pushed-down IN scan).
_QUERY_VEC_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def _knn_query_vecs(spark, sf_dir):
    from pyspark.sql import functions as F

    if sf_dir not in _QUERY_VEC_CACHE:
        rows = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id").isin(KNN_QUERY_IDS))
            .select("vec_id", "embedding")
            .collect()
        )
        _QUERY_VEC_CACHE[sf_dir] = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
        ]
    return _QUERY_VEC_CACHE[sf_dir]


def _q_text_stats(spark, sf_dir):
    return text.text_stats(load_table(spark, sf_dir, "documents"))


def _q_lang_id(spark, sf_dir):
    return text.lang_id(load_table(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    return text.fingerprint(load_table(spark, sf_dir, "documents"))


def _q_dedup_exact(spark, sf_dir):
    """Exact-dup groups over the corpus PLUS a simulated re-crawl
    batch: a deterministic md5-keyed ~1/16 slice of the corpus
    re-ingested under offset doc_ids.  The driver fixture has zero
    exact duplicates below sf0.1, which made this query's oracle match
    vacuous at the sf0.01 gate (round-10 verdict "What's missing" #2);
    the re-crawl union is the realistic way duplicates arise in a
    production ingest (same content, new ids) and is scale-invariant —
    the seeded slice grows with the corpus and the genuine fixture
    dups at sf0.1+ still surface through the same aggregate."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    recrawl = docs.filter(
        F.conv(F.substring(F.md5(F.concat(F.lit("recrawl:"), F.col("text"))), 1, 2), 16, 10)
        .cast("int") % 16 == 0
    ).withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000_000))
    return dedup.exact_duplicates(docs.unionByName(recrawl))


def _q_quality_flags(spark, sf_dir):
    return text.quality_flags(load_table(spark, sf_dir, "documents"))


def _q_split_assign(spark, sf_dir):
    return text.split_assign(load_table(spark, sf_dir, "documents"))


def _q_heavy_hitters(spark, sf_dir):
    """Count-Min sketch vs exact counts for the corpus's top-50 tokens:
    the sketch table is depth x width counters regardless of vocabulary
    size, broadcast back over the probe set for estimation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import sketches

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            text.tokens(F.coalesce(F.col("text"), F.lit("")))
        ).alias("term")
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    # sketch cells sum the exact counts (identical counters by
    # commutativity): one corpus scan feeds both sketch and top-k, and
    # the md5 lane hashing runs per DISTINCT term instead of per
    # occurrence (round-11; the occurrence-stream form is
    # countmin_sketch, kept for the streaming-parity story)
    sk = sketches.countmin_sketch_from_counts(exact, "term", "n_exact")
    # bounded: global window over the distinct-term count frame
    # (vocab-sized), rank-filtered to 50
    w = Window.orderBy(F.desc("n_exact"), F.asc("term"))
    topk = (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 50)
    )
    est = sketches.countmin_estimate(sk, topk, "term")
    return est.select(
        "rank",
        "term",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overcount"),
    )


def _q_budget_sample(spark, sf_dir):
    """Token-budget mixture fill: 40k chars from src0, 80k from src1,
    20k from src2 — deterministic hash-order selection per stratum."""
    return text.budget_sample(
        load_table(spark, sf_dir, "documents"),
        budgets={"src0": 40_000, "src1": 80_000, "src2": 20_000},
    )


def _q_repetition_stats(spark, sf_dir):
    return text.repetition_stats(load_table(spark, sf_dir, "documents"))


def _q_domain_caps(spark, sf_dir):
    return text.domain_caps(load_table(spark, sf_dir, "documents"), cap=15)


def _q_corpus_report(spark, sf_dir):
    return text.corpus_report(load_table(spark, sf_dir, "documents"))


def _q_lm_coverage(spark, sf_dir):
    return text.lm_coverage(load_table(spark, sf_dir, "documents"), min_count=3)


def _q_bpe_pair_counts(spark, sf_dir):
    return text.bpe_pair_counts(load_table(spark, sf_dir, "documents"), top_k=50)


def _q_vocab_topk(spark, sf_dir):
    return text.vocab_topk(load_table(spark, sf_dir, "documents"), k=100)


#: BM25 contract query: literal query terms, fixed order (the score
#: sum is order-sensitive in IEEE arithmetic, so the oracle adds the
#: per-term scores in exactly this order too).
_BM25_TERMS = ("merge", "window", "spark")


def _q_bm25_topk(spark, sf_dir):
    """Search/RAG retrieval ranking: BM25 top-10 documents for a fixed
    query, ratio-idf form — every per-term score is one IEEE division
    of two exact integers, so both engines rank identically."""
    return text.bm25_topk(
        load_table(spark, sf_dir, "documents"), _BM25_TERMS, top_k=10
    )


_HYBRID_QUERY_ID = 3


def _q_hybrid_topk(spark, sf_dir):
    """Hybrid RAG retrieval: BM25 and exact-cosine candidate pools
    fused by integer-exact reciprocal-rank fusion (RRF) — both arms end
    in distributed top-pool, so fusion touches at most 2*pool rows at
    any corpus size."""
    return text.hybrid_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        _BM25_TERMS,
        _HYBRID_QUERY_ID,
        k=10,
        pool=50,
        query_vecs=[
            (q, v) for q, v in _knn_query_vecs(spark, sf_dir)
            if q == _HYBRID_QUERY_ID
        ],
    )


def _q_tfidf_cosine_pairs(spark, sf_dir):
    """Weighted text-similarity pairs: cosine over exact-integer
    tf-idf trigram vectors (decimal dot/norm sums, one IEEE division),
    df-capped posting self-join."""
    return text.tfidf_cosine_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.1, max_df=20, n=3,
    )


def _q_phrase_search(spark, sf_dir):
    """Token-exact phrase matching with OVERLAPPING occurrence counts
    (n-gram containment in one codegen'd projection — no explode, no
    shuffle in the search itself); the oracle replays positions with a
    list lambda.  The phrase is DERIVED from the corpus — its most
    frequent word bigram (count desc, bigram asc tie-break) — the same
    derive-from-data pattern as ivf_cells_auto: a pinned literal
    phrase stops occurring the moment the fixture vocabulary shifts
    (0 matching docs at the heaps decades certified nothing), while
    the modal bigram matches by construction at any SF.  The
    derivation is one explode+count over the bigram vocabulary and a
    1-row collect (bounded: the top bigram, never the corpus)."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions.text import (
        tokens,
        word_ngrams,
    )

    docs = load_table(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    top = (
        # len >= 2 guard: word_ngrams falls back to one whole-text
        # gram for shorter docs — those are unigrams, not bigrams
        docs.filter(F.size(tokens(txt)) >= 2)
        .select(F.explode(word_ngrams(txt, 2)).alias("bigram"))
        # exclude bigrams with an empty token (leading/trailing
        # whitespace artifacts): they don't round-trip phrase.split()
        .filter(
            ~F.col("bigram").startswith(" ")
            & ~F.col("bigram").endswith(" ")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(1)
        .collect()  # bounded: at most one row, the modal bigram
    )
    if not top:
        # degenerate corpus (empty, or no doc carries 2+ tokens):
        # mirror the oracle, whose cross join with an empty top CTE
        # yields zero rows — same schema, no IndexError
        return text.phrase_search(docs, "x y").limit(0)
    return text.phrase_search(docs, top[0]["bigram"])


def _q_tfidf_topterms(spark, sf_dir):
    return text.tfidf_topterms(load_table(spark, sf_dir, "documents"), top_n=3)


def _q_pii_scan(spark, sf_dir):
    return text.pii_scan(load_table(spark, sf_dir, "documents"))


def _q_neardup_clusters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # pin_sigs=False: neardup_clusters pins the pair stream itself, and
    # the extra sigs materialization measured as pure overhead there
    pairs = dedup.simhash_pairs(dedup.simhash(docs), max_hamming=3,
                                pin_sigs=False)
    return dedup.neardup_clusters(docs, pairs)


def _q_canonical_docs(spark, sf_dir):
    """The keep-decision table: near-dup clusters joined to quality
    scores, highest quality (ties to smallest id) crowned canonical —
    dropping is_canonical=false rows IS the dedup."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(dedup.simhash(docs), max_hamming=3,
                                pin_sigs=False)
    clusters = dedup.neardup_clusters(docs, pairs)
    quality = text.text_stats(docs).select("doc_id", "quality_score")
    return dedup.select_canonical(clusters, quality)


def _q_pit_features(spark, sf_dir):
    """Feature-store point-in-time lookup: at each purchase, the
    user's view-stream value that was CURRENT at purchase time —
    interval containment against the SCD2 history, structurally unable
    to leak future updates into training rows."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.operators import joins

    ev = _events(spark, sf_dir)
    dims = analytics.scd2_history(
        ev.filter(F.col("event_type") == "view"), key_cols=("user_id",)
    ).select("user_id", "value", "valid_from", "valid_to")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return joins.pit_join(facts, dims, ["user_id"]).select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("feature_value"),
        F.col("valid_from").alias("feature_since"),
    )


def _q_dedup_corpus(spark, sf_dir):
    return dedup.dedup_exact(load_table(spark, sf_dir, "documents"))


def _q_embedding_clusters(spark, sf_dir):
    """Semantic near-dup groups: the text-dedup connected-components
    machinery run over EMBEDDING near-dup pairs — one clustering
    engine for every signature family."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates(
        emb, threshold=0.3, exact=True, block_col="label"
    )
    return dedup.neardup_clusters(emb, pairs, id_col="vec_id")


def _q_audio_fingerprint(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64, media_type="audio")
    return multimodal.audio_fingerprint(media)


def _q_scene_cuts(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64, media_type="video")
    return multimodal.scene_cuts(media, every_n_bytes=256, max_frames=4)


def _q_frame_samples(spark, sf_dir):
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64)
    frames = multimodal.sample_frames(media, every_n_bytes=256, max_frames=4)
    # binary column projected to (length, hex) so the oracle can rebuild
    # and compare the exact frame content as a plain string
    return frames.select(
        "media_id",
        "frame_index",
        F.length("frame_bytes").cast("long").alias("n_bytes"),
        F.hex("frame_bytes").alias("frame_hex"),
    )


def _q_dedup_minhash_lsh(spark, sf_dir):
    # a tiny threshold emits every overlapping LSH candidate pair with
    # its exact jaccard, so the oracle checks the whole shingle ->
    # signature -> band -> verify pipeline (zero-overlap candidates are
    # jaccard 0 by construction and excluded in both engines).
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.01
    )


def _q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.01
    )


def _q_span_dedup(spark, sf_dir):
    return dedup.span_dedup(
        load_table(spark, sf_dir, "documents"), width=10, max_df=1
    )


def _q_decontaminate(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return dedup.decontaminate(
        docs.filter((F.col("doc_id") % 97) != 0),
        docs.filter((F.col("doc_id") % 97) == 0),
        n=5,
    )


def _q_simhash_docs(spark, sf_dir):
    return dedup.simhash(load_table(spark, sf_dir, "documents"))


def _q_simhash_pairs(spark, sf_dir):
    sigs = dedup.simhash(load_table(spark, sf_dir, "documents"))
    return dedup.simhash_pairs(sigs, max_hamming=3)


def _q_knn_bruteforce(spark, sf_dir):
    return similarity.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=5,
        query_vecs=_knn_query_vecs(spark, sf_dir),
    )


def _q_sq8_topk(spark, sf_dir):
    """Compressed-domain ANN: SQ8 integer-code cosine ranks a per-query
    candidate pool (the byte-cheap scan at 100 TB), exact float cosine
    re-ranks only the pool — FAISS-style asymmetric search, columnar."""
    return similarity.sq8_topk(
        load_table(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=5, pool=20,
        query_vecs=_knn_query_vecs(spark, sf_dir),
    )


def _q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN — the third of the FAISS triad (IVF-flat, SQ8, PQ):
    coarse cells prune the scan, 8-byte PQ codes + per-query ADC lookup
    tables rank candidates in the compressed domain (M table lookups
    per candidate instead of a 64-dim dot), exact cosine re-ranks the
    pool.  Frozen quantizer + codebooks make the path deterministic."""
    return similarity.ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=5, pool=100,
        query_vecs=_knn_query_vecs(spark, sf_dir),
    )


def _q_embedding_drift(spark, sf_dir):
    """Train-vs-val embedding distribution drift: integer-grid
    per-dimension centroid shift between the deterministic hash splits
    — exact integer stats, no order-dependent float means."""
    return similarity.embedding_drift(load_table(spark, sf_dir, "embeddings"))


def _q_quality_classify(spark, sf_dir):
    """Model-based quality gate: frozen-integer-weight linear
    classifier over exact integer text features (the deterministic
    fasttext-style filter after the Gopher rule pass)."""
    return text.quality_classify(load_table(spark, sf_dir, "documents"))


def _q_bpe_encode(spark, sf_dir):
    """Frozen-merges BPE tokenizer applied at scale: real subword piece
    counts per document via 16 delimiter-safe chained replaces (trained
    offline, engine-portable string algebra)."""
    return text.bpe_encode(load_table(spark, sf_dir, "documents"))


def _q_knn_confusion(spark, sf_dir):
    """Embedding-probe confusion matrix: (true, predicted) label counts
    from the kNN majority vote — the per-class error structure behind
    knn_label_eval's per-query verdicts."""
    from pyspark.sql import functions as F

    return (
        _q_knn_label_eval(spark, sf_dir)
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n_queries"))
    )


def _q_hard_negatives(spark, sf_dir):
    """Contrastive-training data mining: each anchor's top-5
    highest-cosine vectors with a DIFFERENT label — ranked among
    negatives only, fused-scan + single tiny shuffle."""
    return similarity.hard_negative_topk(
        load_table(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=5,
    )


def _q_knn_label_eval(spark, sf_dir):
    """Embedding-quality evaluation loop: each query vector's label is
    predicted by majority vote of its exact top-5 neighbors (ties to
    the smaller label), scored against its own label — the
    classification probe run after every embedding retrain."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    nn = _q_knn_bruteforce(spark, sf_dir)
    votes = (
        emb.select("vec_id", "label")
        .join(F.broadcast(nn), F.col("vec_id") == F.col("neighbor_id"))
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    pred = (
        votes.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )
    truth = emb.filter(F.col("vec_id").isin(KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "n_votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


def _recall_report(bf, approx):
    """Shared recall@k audit: per query, how many of the exact scan's
    top-k the approximate result set recovered (exact-integer ppm)."""
    from pyspark.sql import functions as F

    approx = approx.select("query_id", "neighbor_id").withColumn(
        "_hit", F.lit(1)
    )
    return (
        bf.select("query_id", "neighbor_id")
        .join(approx, ["query_id", "neighbor_id"], "left_outer")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
        )
        .withColumn("recall_ppm", F.expr("(1000000 * n_hit) div n_exact"))
    )


def _q_ann_recall_report(spark, sf_dir):
    """Recall@5 of the IVF ANN path against the exact scan, per query —
    the engine audits its own approximation, and the oracle recomputes
    the same report from the same two deterministic result sets."""
    return _recall_report(
        _q_knn_bruteforce(spark, sf_dir), _q_ann_ivf(spark, sf_dir)
    )


def _q_pq_recall_report(spark, sf_dir):
    """Recall@5 of the IVF-PQ path against the exact scan, per query —
    the compressed-domain counterpart of ann_recall_report (same audit,
    ADC-ranked candidates instead of the flat IVF scan)."""
    return _recall_report(
        _q_knn_bruteforce(spark, sf_dir), _q_ivfpq_topk(spark, sf_dir)
    )


def _q_token_surprisal(spark, sf_dir):
    """Unigram surprisal (perplexity proxy) in exact integer bits:
    floor(log2(N/c)) per token via binary string length — gibberish
    ranks high, boilerplate low, no libm in sight."""
    return text.token_surprisal(load_table(spark, sf_dir, "documents"))


def _q_curriculum_order(spark, sf_dir):
    """Easy-to-hard curriculum: exact-integer surprisal difficulty,
    two-level banded global ranking (no single-task sort), equal
    position-slice training stages."""
    from financial_data_ingestion_pipeline_spark.functions import packing

    return packing.curriculum_order(load_table(spark, sf_dir, "documents"))


def _q_bpe_fertility(spark, sf_dir):
    """Per-language tokenizer fertility/compression of the frozen BPE
    merges — subword pieces per word and chars per piece, exact
    integer per-mille ratios."""
    return text.bpe_fertility(load_table(spark, sf_dir, "documents"))


def _q_ann_lsh(spark, sf_dir):
    return similarity.ann_lsh_topk(
        load_table(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=5,
        query_vecs=_knn_query_vecs(spark, sf_dir),
    )


def _q_ann_ivf(spark, sf_dir):
    # pretrained coarse quantizer (the production IVF pattern): the
    # whole query path is deterministic, so the oracle replays cell
    # assignment -> probing -> exact re-rank from the same literals
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )

    return similarity.ivf_topk(
        load_table(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=5,
        centroids=CENTROIDS,
        query_vecs=_knn_query_vecs(spark, sf_dir),
    )


def _q_knn_join(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )

    return similarity.knn_join(
        load_table(spark, sf_dir, "embeddings"), CENTROIDS, k=3
    )


def _q_repeated_spans(spark, sf_dir):
    # ExactSubstr (Lee et al. 2022) via anchor hashes: maximal >=16-char
    # spans whose text occurs >=2 times corpus-wide; no pair join
    return dedup.repeated_spans(
        load_table(spark, sf_dir, "documents"), min_len=16
    )


def _q_source_overlap(spark, sf_dir):
    # exact pairwise shingle Jaccard between sources — the cross-dump
    # contamination matrix; gram fan-out bounded by the source count
    return dedup.source_overlap(load_table(spark, sf_dir, "documents"))


def _q_margin_mining(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )

    # Artetxe & Schwenk margin criterion over the cell-blocked kNN
    # join: cross-label pairs whose cosine beats both endpoints'
    # average neighborhoods; exact-integer ppm margins
    return similarity.margin_mining_pairs(
        load_table(spark, sf_dir, "embeddings"), CENTROIDS, k=3
    )


def _q_span_probe(spark, sf_dir):
    """Batch-vs-corpus ExactSubstr contamination (recompute form; the
    indexed/streaming variants are parity-tested in pytest): maximal
    >=16-char spans in batch docs (id % 10 == 7) whose text occurs
    anywhere in the corpus (the rest)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return dedup.span_cross_spans(
        docs.filter(F.col("doc_id") % 10 == 7),
        docs.filter(F.col("doc_id") % 10 != 7),
        min_len=16,
    )


def _q_span_cut(spark, sf_dir):
    """End-to-end ExactSubstr dedup (Lee et al. 2022): detect maximal
    >=16-char repeated spans and CUT every occurrence, stitching the
    remainder — the action half on top of repeated_spans' detection."""
    return dedup.cut_repeated_spans(
        load_table(spark, sf_dir, "documents"), min_len=16
    )


def _q_span_stats(spark, sf_dir):
    """Per-source ExactSubstr duplication profile (char mass inside
    repeated >=16-char spans, integer ppm) — the Lee et al. 2022
    curator signal for 'how duplicated is each dump'."""
    return dedup.span_stats(load_table(spark, sf_dir, "documents"),
                            min_len=16)


def _q_unimax_allocation(spark, sf_dir):
    """UniMax (Chung et al. 2023) token-budget waterfilling across the
    lang column: 200k-token budget, 2-epoch cap, exact integer
    recurrence replayed by the oracle as a recursive CTE."""
    return text.unimax_allocation(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=200_000, max_epochs=2,
    )


def _q_unimax_sample(spark, sf_dir):
    """The realized UniMax mixture: (doc, epoch) rows under a 10k-token
    budget with a 2-epoch cap — full epochs for every doc plus the
    md5-hash-ordered remainder prefix per language."""
    return text.unimax_sample(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=10_000, max_epochs=2,
    )


def _q_span_cut_probe(spark, sf_dir):
    """The ingest-time ACTION shape: cut from TODAY'S batch (doc_id %
    10 == 7) every span whose text occurs verbatim in the standing
    corpus (the rest) — span_cross_spans detection (identical to
    span_probe_index by construction: same kernel, same membership
    semi-join) feeding cut_spans.  Completes oracle coverage of the
    span family's serve path: detect (span_probe), act (this), index
    maintenance (pytest parity)."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.materialize import pin

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    # pinned: cut_spans reads the spans frame twice (pre-segments +
    # per-doc tail), and unpinned each read re-ran the whole cross-set
    # anchor detection over batch AND corpus — the same O(flagged
    # spans) pin cut_repeated_spans carries (round-11, guide §5)
    spans = pin(
        dedup.span_cross_spans(
            batch, docs.filter(F.col("doc_id") % 10 != 7), min_len=16
        ),
        mode="persist",
    )
    return dedup.cut_spans(batch, spans)


def _q_span_cut_keep_one(spark, sf_dir):
    """ExactSubstr dedup with the KEEP-ONE policy: per span CONTENT
    group, the min-(doc_id, span_start) occurrence survives and every
    other occurrence is cut — the curator's default (the text stays in
    the corpus exactly once).  The engine groups on an internal
    xxhash64 content key; the oracle groups the RAW span substring, so
    every contract run certifies no collision changed which occurrence
    survived."""
    return dedup.cut_repeated_spans(
        load_table(spark, sf_dir, "documents"), min_len=16,
        policy="keep_first",
    )


def _q_source_overlap_merge(spark, sf_dir):
    """Incremental cross-dump overlap: fold a new batch (id % 10 == 7)
    into the standing per-source shingle sets (the rest) and compute
    the matrix from the MERGED postings — merge == full recompute by
    the set-union property, which the full-corpus oracle checks.  The
    disk-index and streaming forms are parity-tested in pytest."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        _overlap_matrix,
        _source_posting,
        merge_overlap_postings,
    )

    docs = load_table(spark, sf_dir, "documents")
    standing = _source_posting(
        docs.filter(F.col("doc_id") % 10 != 7), 3, "text", "source"
    )
    merged = merge_overlap_postings(
        standing, docs.filter(F.col("doc_id") % 10 == 7)
    )
    return _overlap_matrix(merged)


def _q_margin_mining_cross(spark, sf_dir):
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )

    # cross-set Artetxe & Schwenk mining — the published CCMatrix
    # setting (set A mined against set B, each pair normalized by both
    # endpoints' own-side neighborhoods): a BOUNDED arrival batch
    # (the 512 lowest vec_ids with id % 10 == 7, same derivation as
    # knn_cross_join — see there for why the bound IS the serving
    # shape) against the standing corpus (the rest).  Recompute form;
    # the persisted-IVF-index form is parity-tested in pytest.
    emb = load_table(spark, sf_dir, "embeddings")
    batch = (
        emb.filter(F.col("vec_id") % 10 == 7)
        .orderBy("vec_id")
        .limit(512)
    )
    return similarity.margin_mining_cross(
        batch,
        emb.filter(F.col("vec_id") % 10 != 7),
        CENTROIDS,
        k=3,
    )


def _progressive_media_rows() -> list[tuple[int, bytes]]:
    """Deterministic FLAT images encoded as PROGRESSIVE (SOF2) JPEG —
    flat blocks are DC-only, so the decode is analytically exact and
    nowhere near a rounding boundary, making the features safe to pin
    as oracle literals.  Mixed sizes (multi-MCU drives multi-block
    EOB runs), grayscale and RGB (4:4:4 and 4:2:0), two qualities.
    Shared by the contract query (Spark mapInPandas path) and the
    oracle builder (local decode of the SAME bytes)."""
    import numpy as np

    from financial_data_ingestion_pipeline_spark.functions import jpeg_codec

    rows = []
    mid = 0
    for i, val in enumerate((10, 84, 158, 232)):
        img = np.full((8 + 3 * i, 17 + i), val, np.uint8)
        rows.append((mid, jpeg_codec.encode_jpeg(
            img, quality=100 if i % 2 == 0 else 90, progressive=True)))
        mid += 1
    for sub in ((1, 1), (2, 2)):
        img = np.zeros((24, 19, 3), np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = 40, 120, 200
        rows.append((mid, jpeg_codec.encode_jpeg(
            img, quality=100, progressive=True, subsampling=sub)))
        mid += 1
    return rows


def _q_image_features_progressive(spark, sf_dir):
    """Progressive (SOF2) JPEG binaries through the full distributed
    decode path (Arrow batches -> mapInPandas -> pure-numpy multi-scan
    decoder).  The oracle pins the features from an independent local
    decode of the same deterministic bytes."""
    import pandas as pd

    from financial_data_ingestion_pipeline_spark.session import (
        ensure_runtime_conf,
    )

    ensure_runtime_conf(spark)
    media = spark.createDataFrame(
        pd.DataFrame(_progressive_media_rows(),
                     columns=["media_id", "content"])
    )
    return multimodal.extract_image_features(media)


def _q_knn_cross_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )

    # cross-set blocked kNN: a BOUNDED arrival batch (the 512 lowest
    # vec_ids with id % 10 == 7 — deterministic, oracle-replayable)
    # against the standing corpus (the rest).  The bound is the
    # serving shape's defining property: production scores a
    # fixed-size new batch per run, so cost grows with the CORPUS
    # only (linear per decade), not with corpus² — an unbounded
    # %-of-corpus batch made both engine and oracle quadratic at the
    # heaps2 decade (round-11; the all-pairs analytic form remains
    # knn_join_auto with its documented cost model)
    emb = load_table(spark, sf_dir, "embeddings")
    batch = (
        emb.filter(F.col("vec_id") % 10 == 7)
        .orderBy("vec_id")
        .limit(512)
    )
    return similarity.knn_cross_join(
        batch,
        emb.filter(F.col("vec_id") % 10 != 7),
        CENTROIDS,
        k=3,
    )


def _q_knn_join_auto(spark, sf_dir):
    # cells-∝-sqrt(n) auto quantizer: the ivf_cells_auto ladder
    # (integer, replayed by the oracle as greatest(32, 1 <<
    # ((bitlen(q) + 1) // 2)) with q = (n-1)//2 — the power of two
    # nearest sqrt(n/2) from above) sizes the cell count to the
    # corpus, and the stride-seed centroids are
    # ordinary corpus rows the oracle re-derives with WHERE id % stride
    # = 0 ORDER BY id — no frozen literals, no manual retrain, same
    # bit-exact replay.  At the driver SFs (n <= 2000) the ladder
    # lands on 32 cells, pinning the historical constant.
    return similarity.knn_join(
        load_table(spark, sf_dir, "embeddings"), "auto", k=3
    )


def _q_semantic_dedup(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )

    return similarity.semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), CENTROIDS, threshold=0.3
    )


def _q_image_resize_features(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64)
    resized = multimodal.resize_images(media, target_w=32, target_h=32)
    return multimodal.extract_image_features(resized)


def _q_audio_features(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64, media_type="audio")
    return multimodal.extract_audio_features(media)


def _q_embedding_quantize(spark, sf_dir):
    return similarity.quantize_embeddings(
        load_table(spark, sf_dir, "embeddings")
    )


def _q_embedding_neardup(spark, sf_dir):
    # exact within label blocks (the label is the blocking key, so the
    # self-join is block-local instead of a full cross product).
    return similarity.embedding_near_duplicates(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.3,
        exact=True,
        block_col="label",
    )


def _q_embedding_neardup_lsh(spark, sf_dir):
    # auto_bits sizes the band space to the corpus (lsh_auto_bits
    # ladder, replicated in the oracle SQL), keeping bucket occupancy
    # ~constant as data grows: candidates scale ~linearly, not n^2 /
    # fixed-bucket-count.  At sf<=0.1 (n<=2000) the ladder lands on
    # the historical constants (4 bits, 16 planes), so results are
    # bit-identical to the pre-adaptive records.
    return similarity.embedding_near_duplicates(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.3,
        exact=False,
        auto_bits=True,
    )


def _q_image_features(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)  # ships the package to executors
    media = multimodal.synthesize_media_table(spark, n=64)
    return multimodal.extract_image_features(media)


def _q_image_phash(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64)
    return multimodal.image_phash(media)


def _q_image_phash_pairs(spark, sf_dir):
    """Visual near-dup pairs: perceptual hashes from the media pipeline
    fed through the text-dedup chunk-pigeonhole join — one signature
    machinery for every modality."""
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64)
    sigs = multimodal.image_phash(media)
    return dedup.simhash_pairs(
        sigs, id_col="media_id", sig_col="phash",
        max_hamming=14, bits=60, chunks=15,
    )


def _q_image_clusters(spark, sf_dir):
    """Visual near-dup groups: perceptual-hash pairs fed through the
    SAME connected-components engine as text and embedding clusters —
    cross-modality symmetry from one clustering machinery."""
    from financial_data_ingestion_pipeline_spark.session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    media = multimodal.synthesize_media_table(spark, n=64)
    sigs = multimodal.image_phash(media)
    pairs = dedup.simhash_pairs(
        sigs, id_col="media_id", sig_col="phash",
        max_hamming=14, bits=60, chunks=15, pin_sigs=False,
    )
    return dedup.neardup_clusters(media, pairs, id_col="media_id")


def _dec(c, p=18, s=2):
    from pyspark.sql import functions as F

    return F.col(c).cast(f"decimal({p},{s})")


def _revenue_expr():
    from pyspark.sql import functions as F

    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3)
    )


def _q_salted_priority_revenue(spark, sf_dir):
    """The lineitem⋈orders join executed through the explicit salting
    operator: the result is row-identical to the plain join (the
    oracle IS the plain join), while every orderkey spreads over 8
    reducer sub-keys — the single-monster-key remedy AQE can't
    synthesize."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.operators.joins import (
        salted_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "o_orderkey", n_salts=8)
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3)
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def _q_ship_lag_distribution(spark, sf_dir):
    """TPC-H Q12 shape: conditional priority counts per ship-lag class.
    The fixture lineitem has no l_shipmode, so the Q12 grouping key is
    re-expressed as the order->ship lag bucket (FAST/NORMAL/SLOW) — the
    operator shape is identical: fact x fact equi-join on orderkey with
    the date filter pushed into the lineitem scan, then CASE-conditional
    counts per group (cf. dp:261-272 conditional aggregation)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag < 30, "FAST").when(lag < 90, "NORMAL").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(bucket.alias("lag_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def _q_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts
    including zero-order customers — a LEFT OUTER join with the filter
    inside the join condition (not a WHERE, which would turn it inner),
    then two cascaded aggregations.  The second agg's input is one row
    per customer, so the heavy shuffle happens exactly once."""
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def _q_top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the global maximum quarter
    revenue.  The per-supplier aggregate is computed once, its exact-
    DECIMAL max rides back as a broadcast 1-row frame, and the equality
    compare happens on the unrounded decimal — both engines see the
    identical value, so the argmax set is engine-independent."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey").agg(F.sum(_revenue_expr()).alias("_r"))
    )
    mx = rev.agg(F.max("_r").alias("_m"))
    return (
        rev.join(F.broadcast(mx), rev["_r"] == mx["_m"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("_r").cast("double").alias("total_revenue")
        )
    )


def _q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from lines whose quantity sits below
    20% of that part's average — the correlated scalar subquery becomes
    a broadcast per-part aggregate join, and the avg compare is cross-
    multiplied in exact DECIMAL (``5*qty*n < sum_qty``) so no float
    average ever exists for engines to round differently."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    pa = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_dec("l_quantity")).alias("_sq"), F.count(F.lit(1)).alias("_n")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(pa), li["l_partkey"] == pa["_pk"])
        .filter(F.lit(5) * _dec("l_quantity") * F.col("_n") < F.col("_sq"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        )
    )


def _q_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: groups whose share of the global total exceeds a
    threshold — HAVING against a scalar subquery.  The per-part revenue
    aggregate is reused for both sides (one shuffle), the global total
    AND the group count ride as a broadcast 1-row frame, and the
    threshold compare is cross-multiplied in exact DECIMAL
    (``r*n*10 > total*14`` == share > 1.4x the mean part share).  The
    mean-share cutoff is DERIVED from the group count, not a pinned
    part count: a constant denominator goes stale the moment the part
    table scales (the pinned-2000 form returned 0 rows at the heaps1
    decade), while 1.4x-the-mean keeps a non-trivial split at any SF."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(F.sum(_revenue_expr()).alias("_r"))
    tot = pr.agg(F.sum("_r").alias("_t"), F.count(F.lit(1)).alias("_n"))
    return (
        pr.join(F.broadcast(tot))
        .filter(F.col("_r") * F.col("_n") * 10 > F.col("_t") * 14)
        .select(
            "l_partkey",
            F.col("_r").cast("double").alias("part_revenue"),
        )
    )


def _q_supplier_part_variety(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    group, with a NOT-IN supplier exclusion.  The exclusion is a
    broadcast anti-join on the (tiny) negative-balance supplier set; the
    (partkey, suppkey) pairs are deduped BEFORE the attribute join so
    the count-distinct never sees repeated lineitem rows."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") != "PROMO"
    ).select("p_partkey", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        li.distinct()
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
    )
    return (
        pairs.join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum-price supplier within one
    region — the correlated MIN subquery becomes a per-part aggregate
    joined back on (partkey, price) equality.  The equality compares
    raw stored doubles (no arithmetic touches them), so both engines
    agree bit-for-bit; the region restriction is a broadcast dim chain
    applied before the aggregate."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey"
    )
    rsupp = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_name")
    )
    el = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(rsupp), li["l_suppkey"] == rsupp["s_suppkey"])
        .select("l_partkey", "l_suppkey", "s_name", "l_extendedprice")
    )
    mn = el.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("l_extendedprice").alias("_m")
    )
    return (
        el.join(
            F.broadcast(mn),
            (el["l_partkey"] == mn["_pk"]) & (el["l_extendedprice"] == mn["_m"]),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            "s_name",
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
    )


def _q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's part-type
    revenue per order year.  Two independent dimension chains (customer
    -> nation -> region gating the denominator; supplier -> nation
    feeding the numerator flag) broadcast into a single fact join; the
    share is integer parts-per-million from exact decimal unit sums,
    promo_share-style."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rcust = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey")
            ),
            cust["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    snat = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev = _revenue_expr()
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(rcust, F.col("o_custkey") == rcust["c_custkey"], "left_semi")
        .join(F.broadcast(snat), li["l_suppkey"] == snat["s_suppkey"])
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", rev)).alias("_num"),
        F.sum(rev).alias("_den"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    num_units = (F.coalesce(F.col("_num"), F.lit(0)) * 10000).cast("long")
    den_units = (F.col("_den") * 10000).cast("long")
    return agg.select(
        "o_year",
        "n_lines",
        F.coalesce(F.col("_num"), F.lit(0)).cast("double").alias("nation_revenue"),
        F.col("_den").cast("double").alias("total_revenue"),
        (F.lit(1000000) * num_units).alias("_pm_num"),
        den_units.alias("_pm_den"),
    ).select(
        "o_year",
        "n_lines",
        "nation_revenue",
        "total_revenue",
        F.expr("_pm_num div _pm_den").alias("share_ppm"),
    )


def _q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: per (supplier-nation, order-year) profit on a
    part-name slice.  The fixture has no partsupp, so unit cost is
    proxied by 10% of p_retailprice — the operator shape is unchanged:
    4 broadcast dims + one orderkey shuffle join, profit computed in
    exact DECIMAL (rev − cost) before the rollup."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%ring%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _revenue_expr() - _dec("p_retailprice") * _dec("l_quantity") * F.lit(
        "0.1"
    ).cast("decimal(2,1)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely to blame for late multi-
    supplier orders.  The EXISTS / NOT-EXISTS pair collapses into ONE
    per-order aggregate (distinct suppliers, distinct late suppliers,
    the unique late supplier when there is exactly one) — a single
    orderkey shuffle instead of two correlated self-joins; the per-
    supplier rollup then counts the blamed orders."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # Two cascaded aggs instead of two COUNT DISTINCTs in one: a multi-
    # distinct agg compiles to an Expand (x3 row multiplication before
    # the shuffle); pre-collapsing to one row per (order, supplier)
    # keeps every stage map-side-combinable and measured ~5x faster.
    per_supp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("_late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_n_supp"),
            F.sum("_late").alias("_n_late"),
            F.max(F.when(F.col("_late") == 1, F.col("l_suppkey"))).alias(
                "_late_supp"
            ),
        )
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
    )
    return (
        per_order.groupBy("_late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("_late_supp") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "numwait")
    )


def _q_promo_heavy_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who moved more than a threshold
    quantity of any PROMO part in 1997, restricted to one region — the
    nested IN-subqueries become a per-(supplier, part) aggregate
    feeding a LEFT SEMI join against the region-gated supplier dim.
    The threshold compare is on an exact DECIMAL sum."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    heavy = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .join(heavy, supp["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Returned in ALPHABETICAL order (stable, not hand-curated): the
    # grading driver samples a prefix of this dict, and a fixed neutral
    # order keeps that sample independent of the builder.  Full-sweep
    # records: CORRECTNESS_FULL.json / CORRECTNESS_FULL_SF01.json
    # (tools/verify_contract.py runs every entry at both SFs).
    q = {
        "price_change": _q_price_change,
        "daily_ohlc": _q_daily_ohlc,
        "hourly_ohlc": _q_hourly_ohlc,
        "resample_5min": _q_resample_5min,
        "events_clean": _q_events_clean,
        "invalid_rows": _q_invalid_rows,
        "validity_summary": _q_validity_summary,
        "missing_symbols": _q_missing_symbols,
        "ohlc_reconcile": _q_ohlc_reconcile,
        "asof_hourly_close": _q_asof_hourly_close,
        "distinct_symbols": _q_distinct_symbols,
        "date_in_counts": _q_date_in_counts,
        "between_sum": _q_between_sum,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "tpch_q6": _q_tpch_q6,
        "revenue_by_nation": _q_revenue_by_nation,
        "market_share": _q_market_share,
        "text_stats": _q_text_stats,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "quality_flags": _q_quality_flags,
        "quality_classify": _q_quality_classify,
        "pii_scan": _q_pii_scan,
        "chunk_documents": _q_chunk_documents,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "bpe_encode": _q_bpe_encode,
        "bm25_topk": _q_bm25_topk,
        "hybrid_topk": _q_hybrid_topk,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash_docs": _q_simhash_docs,
        "neardup_clusters": _q_neardup_clusters,
        "decontaminate": _q_decontaminate,
        "knn_bruteforce": _q_knn_bruteforce,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "ivfpq_topk": _q_ivfpq_topk,
        "embedding_drift": _q_embedding_drift,
        "sq8_topk": _q_sq8_topk,
        "knn_join": _q_knn_join,
        "knn_join_auto": _q_knn_join_auto,
        "repeated_spans": _q_repeated_spans,
        "span_probe": _q_span_probe,
        "span_cut": _q_span_cut,
        "span_cut_keep_one": _q_span_cut_keep_one,
        "span_cut_probe": _q_span_cut_probe,
        "span_stats": _q_span_stats,
        "unimax_allocation": _q_unimax_allocation,
        "unimax_sample": _q_unimax_sample,
        "source_overlap": _q_source_overlap,
        "source_overlap_merge": _q_source_overlap_merge,
        "margin_mining": _q_margin_mining,
        "margin_mining_cross": _q_margin_mining_cross,
        "knn_cross_join": _q_knn_cross_join,
        "image_features_progressive": _q_image_features_progressive,
        "semantic_dedup": _q_semantic_dedup,
        "embedding_neardup": _q_embedding_neardup,
        "hard_negatives": _q_hard_negatives,
        "image_features": _q_image_features,
        "image_phash": _q_image_phash,
        "audio_features": _q_audio_features,
        "frame_samples": _q_frame_samples,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "simhash_pairs": _q_simhash_pairs,
        "span_dedup": _q_span_dedup,
        "pq_recall_report": _q_pq_recall_report,
        "token_surprisal": _q_token_surprisal,
        "curriculum_order": _q_curriculum_order,
        "bpe_fertility": _q_bpe_fertility,
        "dedup_corpus": _q_dedup_corpus,
        "asof_next_close": _q_asof_next_close,
        "asof_hourly_close_skew": _q_asof_hourly_close_skew,
        "event_sessions": _q_event_sessions,
        "event_transitions": _q_event_transitions,
        "max_drawdown": _q_max_drawdown,
        "calendar_fill": _q_calendar_fill,
        "pattern_match": _q_pattern_match,
        "k_anonymity": _q_k_anonymity,
        "active_users": _q_active_users,
        "rolling_stats": _q_rolling_stats,
        "ewma_prices": _q_ewma_prices,
        "daily_event_pivot": _q_daily_event_pivot,
        "expectations_report": _q_expectations_report,
        "anomaly_flags": _q_anomaly_flags,
        "group_quantiles": _q_group_quantiles,
        "event_pairs": _q_event_pairs,
        "kmv_distinct": _q_kmv_distinct,
        "zorder_stats": _q_zorder_stats,
        "bloom_dedup_probe": _q_bloom_dedup_probe,
        "join_cardinality_estimate": _q_join_cardinality_estimate,
        "range_buckets": _q_range_buckets,
        "split_by_domain": _q_split_by_domain,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "copurchase_pairs": _q_copurchase_pairs,
        "triangle_counts": _q_triangle_counts,
        "customer_hierarchy": _q_customer_hierarchy,
        "association_rules": _q_association_rules,
        "event_concentration": _q_event_concentration,
        "pagerank_items": _q_pagerank_items,
        "quantile_sketch": _q_quantile_sketch,
        "heavy_hitters": _q_heavy_hitters,
        "funnel": _q_funnel,
        "retention_cohorts": _q_retention_cohorts,
        "sample_temperature": _q_sample_temperature,
        "dedup_incremental": _q_dedup_incremental,
        "corpus_rollup": _q_corpus_rollup,
        "corpus_cube": _q_corpus_cube,
        "order_percentiles": _q_order_percentiles,
        "coverage_reconcile": _q_coverage_reconcile,
        "union_extremes": _q_union_extremes,
        "top_events": _q_top_events,
        "big_spenders": _q_big_spenders,
        "late_priority": _q_late_priority,
        "promo_share": _q_promo_share,
        "top_orders_per_customer": _q_top_orders_per_customer,
        "supplier_balance_by_region": _q_supplier_balance_by_region,
        "idle_rich_customers": _q_idle_rich_customers,
        "brand_promo_revenue": _q_brand_promo_revenue,
        "returned_revenue": _q_returned_revenue,
        "nation_trade_volume": _q_nation_trade_volume,
        "ship_lag_distribution": _q_ship_lag_distribution,
        "salted_priority_revenue": _q_salted_priority_revenue,
        "order_count_distribution": _q_order_count_distribution,
        "top_revenue_supplier": _q_top_revenue_supplier,
        "small_qty_revenue": _q_small_qty_revenue,
        "value_concentration": _q_value_concentration,
        "supplier_part_variety": _q_supplier_part_variety,
        "min_cost_supplier": _q_min_cost_supplier,
        "product_profit": _q_product_profit,
        "waiting_suppliers": _q_waiting_suppliers,
        "promo_heavy_suppliers": _q_promo_heavy_suppliers,
        "scd2_history": _q_scd2_history,
        "pit_features": _q_pit_features,
        "table_profile": _q_table_profile,
        "value_streaks": _q_value_streaks,
        "event_props": _q_event_props,
        "pack_sequences": _q_pack_sequences,
        "shuffle_order": _q_shuffle_order,
        "length_batches": _q_length_batches,
        "repetition_stats": _q_repetition_stats,
        "budget_sample": _q_budget_sample,
        "domain_caps": _q_domain_caps,
        "split_assign": _q_split_assign,
        "sample_stratified": _q_sample_stratified,
        "dsir_topk": _q_dsir_topk,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_overlap_pairs": _q_winnow_overlap_pairs,
        "winnow_probe": _q_winnow_probe,
        "corpus_report": _q_corpus_report,
        "lm_coverage": _q_lm_coverage,
        "vocab_topk": _q_vocab_topk,
        "phrase_search": _q_phrase_search,
        "tfidf_topterms": _q_tfidf_topterms,
        "canonical_docs": _q_canonical_docs,
        "knn_label_eval": _q_knn_label_eval,
        "knn_confusion": _q_knn_confusion,
        "ann_recall_report": _q_ann_recall_report,
        "embedding_quantize": _q_embedding_quantize,
        "embedding_clusters": _q_embedding_clusters,
        "image_phash_pairs": _q_image_phash_pairs,
        "image_clusters": _q_image_clusters,
        "image_resize_features": _q_image_resize_features,
        "audio_fingerprint": _q_audio_fingerprint,
        "scene_cuts": _q_scene_cuts,
    }
    return dict(sorted(q.items()))


# ---------------------------------------------------------------------------
# oracle_sql()
# ---------------------------------------------------------------------------

# DuckDB 1.0 arg_min/arg_max take a plain sortable ordering column, not a
# struct; the fixtures are verified tie-free on (event_type, ts), so plain
# ts gives the same answer as Spark's (ts, event_id) tie-broken min_by.
_OHLC_AGGS = """
        arg_min(value, ts) AS open,
        max(value) AS high,
        min(value) AS low,
        arg_max(value, ts) AS close
"""


# Shared DuckDB fragments for the text/dedup oracles.  These mirror the
# Spark expressions exactly: md5-substring hashes, fixed-width-hex
# minhash strings, identical rounding.  DuckDB gotcha: regexp_replace
# needs the 'g' flag to replace all occurrences (Spark always does).
# coalesce mirrors the engine (every text operator treats NULL text as
# ''): NULL text must yield one empty token on both sides, not a NULL
# array with zero posting rows (advisor finding, round 3).
_DUCK_TOKS = r"regexp_split_to_array(coalesce(text, ''), '\s+')"
_DUCK_SHINGLES = (
    "list_distinct(CASE WHEN len(t) >= 3 THEN "
    "list_transform(range(0, len(t)-2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) "
    "ELSE [array_to_string(t, ' ')] END)"
)
_EN_STOP_SQL = "('the','a','of','and','to','is','in','that')"


def _duck_minhash_cte(num_perm: int = 12, bands: int = 4) -> str:
    rows = num_perm // bands
    # two 64-bit lanes per digest: perm i reads hex window (1,16) or
    # (17,16) of md5(i//2 || ':' || s) — mirrors minhash_signatures
    sig_exprs = ",\n           ".join(
        f"list_min(list_transform(sh, s -> substr(md5('{i // 2}:' || s),"
        f" {1 + 16 * (i % 2)}, 16))) AS s{i}"
        for i in range(num_perm)
    )
    band_exprs = ", ".join(
        "'B{b}' || '|' || ".format(b=b)
        + " || '|' || ".join(f"s{b * rows + j}" for j in range(rows))
        for b in range(bands)
    )
    return f"""
        toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
        shing AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM toks),
        sigs AS (SELECT doc_id, sh, {sig_exprs} FROM shing),
        bands AS (SELECT doc_id, sh, unnest([{band_exprs}]) AS band_key FROM sigs)
    """


def _duck_bpe_wp_cte() -> str:
    """DuckDB replay of the frozen 1,024-merge BPE encode over the
    DISTINCT word vocabulary: merges applied sequentially in rank
    order, one non-overlapping left-to-right replace each, folded by
    ``list_reduce`` (the first list element is the accumulator seed).
    Equals the engine's canonical min-rank loop for TRAINED merge
    lists — a merge producing token T precedes every merge consuming
    it (see scripts/train_bpe_merges.py; property-tested).  Each piece
    is wrapped ``<...>`` so one replace per merge can neither cross
    piece boundaries nor miss adjacent repeats of the same pair.
    Expects a CTE ``w`` with a ``word`` column; yields ``wp(word, p)``.
    """
    from financial_data_ingestion_pipeline_spark.functions.bpe_pretrained import (
        MERGES,
    )

    items = ", ".join(f"'<{a}><{b}>|<{a}{b}>'" for a, b in MERGES)
    enc = (
        "list_reduce(list_prepend(regexp_replace(word, '(.)', '<\\1>', 'g'), "
        f"[{items}]), (acc, m) -> replace(acc, string_split(m, '|')[1], "
        "string_split(m, '|')[2]))"
    )
    return f"""
            vocabw AS (SELECT DISTINCT word FROM w),
            wp AS (
                SELECT word,
                       CAST(length(e) - length(replace(e, '<', '')) AS BIGINT) AS p
                FROM (SELECT word, {enc} AS e FROM vocabw)
            )
    """


def _duck_simhash_cte(bits: int = 60) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> {b}) & 1)) > n "
        f"THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return f"""
        toks AS (SELECT doc_id, list_distinct({_DUCK_TOKS}) AS t FROM documents),
        h AS (SELECT doc_id,
                     list_transform(t, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS hs,
                     len(t) AS n
              FROM toks),
        sigs AS MATERIALIZED (SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash,
                        CAST(n AS BIGINT) AS n_distinct_tokens FROM h)
    """


def _duck_simhash_pairs_cte(max_hamming: int = 3, bits: int = 60) -> str:
    """Pair CTEs ``cand``/``p`` appended after :func:`_duck_simhash_cte`
    (leading comma): hamming<={max_hamming} pairs via the pigeonhole
    candidate restriction — split the {bits}-bit signature into
    max_hamming+1 chunks; any pair within the hamming budget must agree
    exactly on at least one chunk, so the UNION of the per-chunk
    equi-joins followed by the exact hamming filter returns the SAME
    set as the O(n^2) cross join.  The brute-force form stays the
    cross-validation story (pytest pins chunk-join == brute force on
    small corpora); as an ORACLE it was quadratic-infeasible at the
    heaps2 decade (500k docs = 125e9 sig comparisons, >90 min in
    DuckDB) while the engine's own chunk join runs in seconds."""
    n_chunks = max_hamming + 1
    w = bits // n_chunks
    mask = (1 << w) - 1
    chunk_joins = "\n                UNION\n".join(
        f"""
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sigs a JOIN sigs b
                  ON ((a.simhash >> {i * w}) & {mask})
                     = ((b.simhash >> {i * w}) & {mask})
                 AND a.doc_id < b.doc_id"""
        for i in range(n_chunks)
    )
    return f""",
            cand AS ({chunk_joins}
            ),
            p AS MATERIALIZED (
                SELECT c.id_a, c.id_b,
                       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                           AS hamming
                FROM cand c
                JOIN sigs a ON a.doc_id = c.id_a
                JOIN sigs b ON b.doc_id = c.id_b
                WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
            )"""


_DUCK_COSINE = """
    round(
      list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
      / sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))
             * list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))), 6)
"""

_KNN_IDS_SQL = ", ".join(str(i) for i in KNN_QUERY_IDS)

_DUCK_SQ = "list_sum(list_transform({v}, x -> x::DOUBLE * x::DOUBLE))"


def _duck_neardup_cluster_sql(max_hamming: int = 3) -> str:
    """Connected components over the simhash pair graph as one
    recursive-CTE query — shared by the neardup_clusters oracle and
    everything that builds on the cluster table (canonical selection)."""
    return f"""
            WITH RECURSIVE {_duck_simhash_cte()}{_duck_simhash_pairs_cte(max_hamming)},
            e AS MATERIALIZED (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION
                SELECT id_b, id_a FROM p
            ),
            reach(src, node) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.dst FROM reach r JOIN e ON r.node = e.src
            )
            SELECT src AS doc_id, min(node) AS cluster_id
            FROM reach GROUP BY 1
    """


# --- deterministic ANN oracle generators -----------------------------------
# These replay the engine's exact bucket/cell candidate construction in
# SQL from the same literals (plane coefficients are whole numbers and
# embeddings float32, so every product is exact in double precision and
# the sequential-fold sums agree bit-for-bit across engines — see
# functions/similarity.py determinism contract).

def _duck_matrix(rows: list[list[float]]) -> str:
    inner = ("[" + ", ".join(repr(float(v)) for v in r) + "]" for r in rows)
    return "CAST([" + ", ".join(inner) + "] AS DOUBLE[][])"


def _duck_dvec(vals: list[float]) -> str:
    return "CAST([" + ", ".join(repr(float(v)) for v in vals) + "] AS DOUBLE[])"


def _duck_lsh_keys_cte(
    planes: list[list[float]], tables: list[list[int]], dim: int = 64
) -> str:
    """CTEs ``e`` (vec, sq) and ``keys`` (one bucket key per table)."""
    key_exprs = []
    for t, idxs in enumerate(tables):
        terms = [str(t << len(idxs))] + [
            f"b[{ix + 1}] * {1 << j}" for j, ix in enumerate(idxs)
        ]
        key_exprs.append("CAST(" + " + ".join(terms) + " AS BIGINT)")
    sq = _DUCK_SQ.format(v="embedding")
    return f"""
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        bits AS (
            SELECT vec_id, list_transform({_duck_matrix(planes)},
                p -> CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                                        i -> embedding[i]::DOUBLE * p[i])) > 0
                          THEN 1 ELSE 0 END) AS b
            FROM e
        ),
        keys AS (SELECT vec_id, [{", ".join(key_exprs)}] AS ks FROM bits)
    """


def _duck_rerank_sql(cand_cte: str, k: int) -> str:
    """Shared tail: exact cosine re-rank of the ``cand(qid, nid)`` CTE
    (appended to an open WITH list, hence the leading comma)."""
    dot = (
        "list_sum(list_transform(range(1, len(qa.embedding)+1),"
        " i -> qa.embedding[i]::DOUBLE * nb.embedding[i]::DOUBLE))"
    )
    return f""",
        {cand_cte},
        scored AS (
            SELECT c.qid AS query_id, c.nid AS neighbor_id,
                   round({dot} / sqrt(qa.sq * nb.sq), 6) AS sim
            FROM cand c
            JOIN e qa ON qa.vec_id = c.qid
            JOIN e nb ON nb.vec_id = c.nid
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def _bm25_oracle(top_k: int = 10) -> str:
    """BM25 oracle (ratio-idf, exact-integer cores), parameterized
    top-k so fusion oracles can reuse a deeper candidate pool."""
    return r"""
            WITH dl AS (
                SELECT doc_id,
                       CAST(len(regexp_split_to_array(coalesce(text, ''),
                            '\s+')) AS BIGINT) AS dl
                FROM documents
            ),
            totals AS (
                SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS total
                FROM dl
            ),
            tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(coalesce(text, ''),
                              '\s+')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ({terms}) GROUP BY 1, 2
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            piv AS (
                SELECT doc_id, {pivots}
                FROM tf JOIN dfreq USING (term) GROUP BY 1
            ),
            base AS (
                SELECT d.doc_id, d.dl, n, total, {coalesced}
                FROM dl d LEFT JOIN piv USING (doc_id) CROSS JOIN totals
            ),
            scored AS (
                SELECT doc_id,
                       CAST({hits} AS BIGINT) AS n_hits,
                       {score} AS score
                FROM base
            ),
            ranked AS (
                SELECT doc_id, n_hits, score,
                       CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                            AS BIGINT) AS rank
                FROM scored
            )
            SELECT * FROM ranked WHERE rank <= {top_k}
        """.format(
            top_k=top_k,
            terms=", ".join(f"'{t}'" for t in _BM25_TERMS),
            pivots=", ".join(
                f"max(CASE WHEN term = '{t}' THEN tf END) AS tf{i}, "
                f"max(CASE WHEN term = '{t}' THEN df END) AS df{i}"
                for i, t in enumerate(_BM25_TERMS)
            ),
            coalesced=", ".join(
                f"coalesce(tf{i}, 0) AS tf{i}, coalesce(df{i}, 0) AS df{i}"
                for i in range(len(_BM25_TERMS))
            ),
            hits=" + ".join(
                f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
                for i in range(len(_BM25_TERMS))
            ),
            score=" + ".join(
                f"(CASE WHEN tf{i} > 0 THEN "
                f"CAST((2*n - 2*df{i} + 1) * 44 * total * tf{i} AS DOUBLE) / "
                f"CAST((2*df{i} + 1) * (20*total*tf{i} + 6*total + 18*dl*n) "
                f"AS DOUBLE) ELSE 0.0 END)"
                for i in range(len(_BM25_TERMS))
            ),
        )


def _sq8_oracle(k: int = 5, pool: int = 20, hi: int = 255) -> str:
    """Full SQ8 replay: per-dim min/max codebook -> integer codes ->
    code-cosine pool -> exact re-rank.  Codes are one fixed-association
    IEEE expression from exact-double inputs, identical to the engine's
    numpy kernel."""
    return f"""
        WITH stats AS (
            SELECT pos, min(val::DOUBLE) AS mn, max(val::DOUBLE) AS mx
            FROM (
                SELECT unnest(embedding) AS val,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings
            ) GROUP BY 1
        ),
        packed AS (
            SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
            FROM stats
        ),
        codes AS (
            SELECT vec_id,
                   list_transform(range(1, len(embedding) + 1),
                       i -> CASE WHEN mxs[i] = mns[i] THEN 0
                            ELSE least(greatest(CAST(floor(
                                ((embedding[i]::DOUBLE - mns[i]) * {hi})
                                / (mxs[i] - mns[i])) AS BIGINT), 0), {hi})
                            END) AS code
            FROM embeddings, packed
        ),
        q AS (
            SELECT vec_id AS query_id, code AS qcode FROM codes
            WHERE vec_id IN ({_KNN_IDS_SQL})
        ),
        approx AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   round(
                     list_sum(list_transform(range(1, len(qcode) + 1),
                         i -> qcode[i] * c.code[i]))::DOUBLE
                     / sqrt(list_sum(list_transform(qcode, x -> x * x))::DOUBLE
                            * list_sum(list_transform(c.code, x -> x * x))::DOUBLE),
                     6) AS ascore
            FROM q, codes c WHERE c.vec_id <> q.query_id
        ),
        pool AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY ascore DESC, neighbor_id)
                           AS pr
                FROM approx
            ) WHERE pr <= {pool}
        ),
        rer AS (
            SELECT p.query_id, p.neighbor_id,
                   {_DUCK_COSINE.format(a="qe.embedding", b="ne.embedding")} AS sim
            FROM pool p
            JOIN embeddings qe ON qe.vec_id = p.query_id
            JOIN embeddings ne ON ne.vec_id = p.neighbor_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM rer
        ) WHERE rank <= {k}
    """


def _ivfpq_oracle(k: int = 5, pool: int = 100) -> str:
    """Full IVF-PQ replay: frozen-quantizer cell assignment + probing
    (the ann_ivf preamble), per-subspace PQ encode (L2 argmin via
    ``cb_sq - 2*subdot``, ties -> lowest codeword), ADC scoring
    (per-query LUT of subvector-codeword fold dots, summed in subspace
    order), pool ranking, exact re-rank.  Every float expression uses
    the same sequential-fold association as the engine's numpy kernel,
    so codes, ADC scores and ranks agree bit-for-bit."""
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.functions.pq_pretrained import (
        CODEBOOKS,
        N_CODES,
        SUBDIM,
        SUBSPACES,
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        DEFAULT_N_PROBE,
        _py_sqnorm,
    )

    norms = [_py_sqnorm(c) for c in CENTROIDS]
    cb_sq = [[_py_sqnorm(cw) for cw in book] for book in CODEBOOKS]
    books = (
        "CAST(["
        + ", ".join(
            "[" + ", ".join(
                "[" + ", ".join(repr(float(v)) for v in cw) + "]"
                for cw in book
            ) + "]"
            for book in CODEBOOKS
        )
        + "] AS DOUBLE[][][])"
    )
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    sub_dot = (
        f"list_sum(list_transform(range(1, {SUBDIM + 1}),"
        f" d -> embedding[m * {SUBDIM} + d]::DOUBLE * cbm[m + 1][j + 1][d]))"
    )
    return f"""
        WITH p AS (SELECT {_duck_matrix(CENTROIDS)} AS cm, {_duck_dvec(norms)} AS cn),
        cb AS (SELECT {books} AS cbm, {_duck_matrix(cb_sq)} AS cbsq),
        ms AS (SELECT unnest(range({SUBSPACES})) AS m),
        js AS (SELECT unnest(range({N_CODES})) AS j),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range({len(CENTROIDS)})) AS cell) cells
        ),
        ranked AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked WHERE rk = 1),
        probe AS (
            SELECT vec_id AS qid, cell FROM ranked
            WHERE rk <= {DEFAULT_N_PROBE} AND vec_id IN ({_KNN_IDS_SQL})
        ),
        cand0 AS (
            SELECT DISTINCT qid, nid FROM probe JOIN assign USING (cell)
            WHERE qid <> nid
        ),
        enc AS (
            SELECT vec_id, m, j,
                   cbsq[m + 1][j + 1] - 2 * {sub_dot} AS score
            FROM e CROSS JOIN cb CROSS JOIN ms CROSS JOIN js
            WHERE vec_id IN (SELECT nid FROM cand0)
        ),
        code_rank AS (
            SELECT vec_id, m, j,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY score ASC, j ASC) AS crk
            FROM enc
        ),
        codes AS (SELECT vec_id, m, j AS code FROM code_rank WHERE crk = 1),
        recon AS (
            SELECT c.vec_id,
                   list_sum(list(cbsq[c.m + 1][c.code + 1] ORDER BY c.m))
                       AS recon_sq
            FROM codes c CROSS JOIN cb GROUP BY 1
        ),
        lutq AS (
            SELECT q.vec_id AS qid, m, j, {sub_dot.replace("embedding", "q.embedding")} AS lv
            FROM e q CROSS JOIN cb CROSS JOIN ms CROSS JOIN js
            WHERE q.vec_id IN ({_KNN_IDS_SQL})
        ),
        adc AS (
            SELECT c0.qid, c0.nid,
                   list_sum(list(l.lv ORDER BY l.m)) AS adc_dot
            FROM cand0 c0
            JOIN codes c ON c.vec_id = c0.nid
            JOIN lutq l ON l.qid = c0.qid AND l.m = c.m AND l.j = c.code
            GROUP BY 1, 2
        ),
        pooled AS (
            SELECT a.qid, a.nid,
                   row_number() OVER (PARTITION BY a.qid ORDER BY
                       round(a.adc_dot / sqrt(qe.sq * r.recon_sq), 6) DESC,
                       a.nid ASC) AS pr
            FROM adc a
            JOIN e qe ON qe.vec_id = a.qid
            JOIN recon r ON r.vec_id = a.nid
        ){_duck_rerank_sql(
            f"cand AS (SELECT qid, nid FROM pooled WHERE pr <= {pool})", k)}
    """


def _knn_bruteforce_oracle(k: int = 5) -> str:
    return f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_vec
            FROM embeddings WHERE vec_id IN ({_KNN_IDS_SQL})
        ),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_DUCK_COSINE.format(a="q.q_vec", b="e.embedding")} AS sim
            FROM q, embeddings e WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def _ann_recall_oracle() -> str:
    """Recall@k of the IVF ANN path against the exact scan — both sides
    are the other two oracles verbatim, so this measures exactly what
    the engine measures."""
    return f"""
        WITH bf AS (SELECT * FROM ({_knn_bruteforce_oracle()})),
             ivf AS (SELECT * FROM ({_ann_ivf_oracle()}))
        SELECT bf.query_id,
               count(*) AS n_exact,
               CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               (1000000 * CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL
                                        THEN 1 ELSE 0 END) AS BIGINT))
                   // count(*) AS recall_ppm
        FROM bf
        LEFT JOIN ivf i
          ON bf.query_id = i.query_id AND bf.neighbor_id = i.neighbor_id
        GROUP BY 1
    """


def _pq_recall_oracle() -> str:
    """Recall@k of the IVF-PQ path against the exact scan — both sides
    are the other two oracles verbatim, so this measures exactly what
    the engine measures."""
    return f"""
        WITH bf AS (SELECT * FROM ({_knn_bruteforce_oracle()})),
             pq AS (SELECT * FROM ({_ivfpq_oracle()}))
        SELECT bf.query_id,
               count(*) AS n_exact,
               CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               (1000000 * CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL
                                        THEN 1 ELSE 0 END) AS BIGINT))
                   // count(*) AS recall_ppm
        FROM bf
        LEFT JOIN pq p
          ON bf.query_id = p.query_id AND bf.neighbor_id = p.neighbor_id
        GROUP BY 1
    """


def _pagerank_oracle(iters: int = 3, damping_pct: int = 85) -> str:
    """Unrolled integer-PageRank replay over the co-purchase edges."""
    scale = 10**12
    base = ((100 - damping_pct) * scale) // 100
    out = f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem
        ),
        bounded AS MATERIALIZED (
            SELECT basket, item FROM items
            WHERE basket NOT IN (
                SELECT basket FROM items GROUP BY 1 HAVING count(*) > 32)
        ),
        pairs AS MATERIALIZED (
            SELECT a.item AS s, b.item AS t
            FROM bounded a
            JOIN bounded b ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        -- MATERIALIZED: DuckDB 1.0 re-executes a multiply-referenced
        -- CTE per reference — the unrolled 3-iteration replay
        -- referenced `directed`/`deg` 4-7x, re-running the basket
        -- self-join each time (OOM'd the oracle at the heaps decade)
        directed AS MATERIALIZED (
            SELECT s AS src, t AS dst FROM pairs
            UNION ALL
            SELECT t AS src, s AS dst FROM pairs
        ),
        deg AS MATERIALIZED (
            SELECT src, count(*) AS deg FROM directed GROUP BY 1),
        r0 AS (SELECT src AS node, CAST({scale} AS BIGINT) AS rank FROM deg)"""
    prev = "r0"
    for i in range(1, iters + 1):
        out += f""",
        i{i} AS (
            SELECT d.src AS node,
                   {base} + ({damping_pct} * coalesce(sum(c._c), 0)) // 100
                       AS rank
            FROM deg d
            LEFT JOIN (
                SELECT e.dst, r.rank // g.deg AS _c
                FROM directed e
                JOIN {prev} r ON e.src = r.node
                JOIN deg g ON e.src = g.src) c
              ON c.dst = d.src
            GROUP BY 1
        )"""
        prev = f"i{i}"
    out += f"""
        SELECT node, CAST(rank AS BIGINT) AS rank FROM {prev}
    """
    return out


def _kmv_oracle(k: int = 32) -> str:
    """Replays the k-mins sketch: per group, three independent 40-bit
    lanes per md5 digest and the same fixed-order sum -> estimate."""
    lanes = []
    for j in range((k + 2) // 3):
        for start in (1, 11, 21):
            if len(lanes) < k:
                lanes.append(
                    f"CAST('0x' || substr(md5('kmv{j}:' || CAST(user_id AS"
                    f" VARCHAR)), {start}, 10) AS BIGINT)"
                    " / 1099511627776.0"
                )
    mins = ",\n                   ".join(
        f"min({lane}) AS m{i}" for i, lane in enumerate(lanes)
    )
    total = " + ".join(f"m{i}" for i in range(k))
    return f"""
            WITH sk AS (
                SELECT event_type AS symbol,
                   count(DISTINCT user_id) AS n_distinct_exact,
                   {mins}
                FROM events GROUP BY event_type
            )
            SELECT symbol, n_distinct_exact,
                   round({float(k)} / ({total}) - 1.0, 6) AS n_distinct_est
            FROM sk
        """


def _kmv_overlap_oracle(k: int = 32) -> str:
    """Replays kmv_overlap: per-lane string minima for A / B / union,
    then the same fixed-order inclusion-exclusion estimates."""
    lane_exprs = []
    i = 0
    for j in range((k + 2) // 3):
        for start in (1, 11, 21):
            if i < k:
                lane_exprs.append(
                    (i, f"substr(md5('kmv{j}:' || v), {start}, 10)")
                )
                i += 1
    mins = ",\n                   ".join(
        f"min({lane}) AS u{i},\n                   "
        f"min(CASE WHEN ia = 1 THEN {lane} END) AS a{i},\n                   "
        f"min(CASE WHEN ib = 1 THEN {lane} END) AS b{i}"
        for i, lane in lane_exprs
    )

    def total(prefix: str) -> str:
        return " + ".join(
            f"CAST('0x' || {prefix}{i} AS BIGINT) / 1099511627776.0"
            for i in range(k)
        )

    return f"""
            WITH tagged AS (
                SELECT CAST(o_custkey AS VARCHAR) AS v, 1 AS ia, 0 AS ib
                FROM orders
                UNION ALL
                SELECT CAST(c_custkey AS VARCHAR), 0, 1 FROM customer
            ), sk AS (
                SELECT {mins}
                FROM tagged
            ), ests AS (
                SELECT round({float(k)} / ({total("a")}) - 1.0, 6) AS n_a_est,
                       round({float(k)} / ({total("b")}) - 1.0, 6) AS n_b_est,
                       round({float(k)} / ({total("u")}) - 1.0, 6) AS union_est
                FROM sk
            )
            SELECT n_a_est, n_b_est, union_est,
                   greatest(0.0, round(n_a_est + n_b_est - union_est, 6))
                       AS inter_est
            FROM ests
        """


def _ann_lsh_oracle(k: int = 5) -> str:
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        DEFAULT_BITS_PER_TABLE,
        DEFAULT_MULTIPROBE,
        DEFAULT_NUM_PLANES,
        DEFAULT_NUM_TABLES,
        plane_coeffs,
        probe_masks,
        table_indices,
    )

    planes = plane_coeffs(DEFAULT_NUM_PLANES, 64)
    tables = table_indices(
        DEFAULT_NUM_PLANES, DEFAULT_BITS_PER_TABLE, DEFAULT_NUM_TABLES
    )
    masks = probe_masks(DEFAULT_BITS_PER_TABLE, DEFAULT_MULTIPROBE)
    masks_sql = "CAST([" + ", ".join(str(m) for m in masks) + "] AS BIGINT[])"
    return f"""
        WITH {_duck_lsh_keys_cte(planes, tables)},
        base AS (SELECT vec_id AS nid, unnest(ks) AS bucket FROM keys),
        qprobe AS (
            SELECT vec_id AS qid,
                   unnest(flatten(list_transform(ks,
                       k -> list_transform({masks_sql}, m -> xor(k, m))))) AS bucket
            FROM keys WHERE vec_id IN ({_KNN_IDS_SQL})
        ){_duck_rerank_sql(
            "cand AS (SELECT DISTINCT qid, nid FROM qprobe JOIN base USING (bucket) "
            "WHERE qid <> nid)", k)}
    """


def _ann_ivf_oracle(k: int = 5) -> str:
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        DEFAULT_N_PROBE,
        _py_sqnorm,
    )

    norms = [_py_sqnorm(c) for c in CENTROIDS]
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    return f"""
        WITH p AS (SELECT {_duck_matrix(CENTROIDS)} AS cm, {_duck_dvec(norms)} AS cn),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range({len(CENTROIDS)})) AS cell) cells
        ),
        ranked AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked WHERE rk = 1),
        probe AS (
            SELECT vec_id AS qid, cell FROM ranked
            WHERE rk <= {DEFAULT_N_PROBE} AND vec_id IN ({_KNN_IDS_SQL})
        ){_duck_rerank_sql(
            "cand AS (SELECT DISTINCT qid, nid FROM probe JOIN assign USING (cell) "
            "WHERE qid <> nid)", k)}
    """


def _knn_join_oracle(k: int = 3) -> str:
    """Replays the blocked kNN self-join: nearest-cell assignment from
    the frozen quantizer literals, cell-equi candidates, exact
    re-rank — same preamble as the ann_ivf oracle."""
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        _py_sqnorm,
    )

    norms = [_py_sqnorm(c) for c in CENTROIDS]
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    return f"""
        WITH p AS (SELECT {_duck_matrix(CENTROIDS)} AS cm, {_duck_dvec(norms)} AS cn),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range({len(CENTROIDS)})) AS cell) cells
        ),
        ranked AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked WHERE rk = 1){_duck_rerank_sql(
        "cand AS (SELECT a.nid AS qid, b.nid FROM assign a "
        "JOIN assign b USING (cell) WHERE a.nid <> b.nid)", k)}
    """


def _knn_join_auto_oracle(k: int = 3) -> str:
    """Replays the AUTO-quantized blocked kNN self-join with NO frozen
    literals: the cell-count ladder (``greatest(32, 1 <<
    ((bitlen(q) + 1) // 2))`` with ``q = (n-1)//2``, i.e. the power
    of two nearest sqrt(n/2) from above — ``ivf_cells_auto``), the
    stride-seed
    centroids (``vec_id % stride = 0 ORDER BY vec_id``, first
    ``cells`` — ``auto_seed_centroids``), and the same assignment +
    exact re-rank as the frozen-quantizer oracle.  Everything derives
    from the data, so the oracle proves the auto path end-to-end."""
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    return f"""
        WITH par AS (
            SELECT n, cells, greatest(1, n // cells) AS stride FROM (
                SELECT n,
                       greatest(32,
                           1 << ((length(bin((greatest(n, 1) - 1) // 2))
                                  + 1) // 2)) AS cells
                FROM (SELECT count(*) AS n FROM embeddings)
            )
        ),
        seeds AS (
            SELECT vec_id, embedding,
                   row_number() OVER (ORDER BY vec_id) AS rk
            FROM embeddings, par
            WHERE vec_id % stride = 0
        ),
        p AS (
            SELECT list(list_transform(embedding, x -> x::DOUBLE)
                        ORDER BY vec_id) AS cm,
                   list({sq} ORDER BY vec_id) AS cn
            FROM seeds WHERE rk <= (SELECT cells FROM par)
        ),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range((SELECT len(cm) FROM p)))
                        AS cell) cells
        ),
        ranked AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked WHERE rk = 1){_duck_rerank_sql(
        "cand AS (SELECT a.nid AS qid, b.nid FROM assign a "
        "JOIN assign b USING (cell) WHERE a.nid <> b.nid)", k)}
    """


def _margin_mining_oracle(k: int = 3, min_margin_ppm: int = 1_000_000) -> str:
    """Replays margin_mining_pairs: the frozen-quantizer kNN join
    (embedded as a subquery — its own WITH nests fine inside a
    parenthesized FROM), 6-dp sims lifted to exact int64 ppm, integer
    neighborhood sums, and the all-integer margin division (``//`` ==
    Spark ``div`` on the non-negative operands the sim6 > 0 / den > 0
    filters guarantee)."""
    return f"""
        WITH knn AS (SELECT * FROM ({_knn_join_oracle(k)})),
        s AS (SELECT query_id, neighbor_id, sim,
                     CAST(round(sim * 1000000) AS BIGINT) AS sim6 FROM knn),
        deg AS (SELECT query_id AS nid, CAST(sum(sim6) AS BIGINT) AS deg6,
                       count(*) AS n FROM s GROUP BY 1),
        m AS (
            SELECT s.query_id, s.neighbor_id, s.sim, s.sim6,
                   dq.deg6 * dn.n + dn.deg6 * dq.n AS den,
                   dq.n AS nq, dn.n AS nn_
            FROM s
            JOIN deg dq ON dq.nid = s.query_id
            JOIN deg dn ON dn.nid = s.neighbor_id
            WHERE s.sim6 > 0
        )
        SELECT m.query_id, m.neighbor_id, m.sim,
               CAST((2000000 * sim6 * nq * nn_) // den AS BIGINT)
                   AS margin_ppm
        FROM m
        JOIN embeddings la ON la.vec_id = m.query_id
        JOIN embeddings lb ON lb.vec_id = m.neighbor_id
        WHERE den > 0 AND la.label <> lb.label
          AND (2000000 * sim6 * nq * nn_) // den >= {min_margin_ppm}
    """


# image_features_progressive ground truth, PINNED as source constants —
# not recomputed from the codec at oracle-build time, so a decoder bug
# cannot leak into its own oracle (round-8 ADVICE): these are the
# analytically-exact features of _progressive_media_rows()'s flat
# DC-only images (mean_byte == the flat fill value: 10/84/158/232 gray,
# (40+120+200)/3 = 120 -> after 4:4:4 and 4:2:0 RGB round-trip 105.0
# both, because flat chroma survives subsampling exactly), verified
# against a fresh local decode by tests/test_jpeg.py::
# test_progressive_oracle_constants_pinned.  n_bytes pins the encoder's
# byte stream length; changing the encoder legitimately requires
# re-pinning BOTH here and in that test.
PROGRESSIVE_FEATURE_TRUTH: list[tuple[int, int, int, int, float]] = [
    (0, 17, 8, 549, 10.0),
    (1, 18, 11, 548, 84.0),
    (2, 19, 14, 547, 158.0),
    (3, 20, 17, 551, 232.0),
    (4, 19, 24, 906, 105.0),
    (5, 19, 24, 904, 105.0),
]


def _image_features_progressive_oracle() -> str:
    """The progressive-decode features as PINNED literals
    (``PROGRESSIVE_FEATURE_TRUTH`` — precomputed constants checked into
    the oracle source, not a fresh call into the codec under test).
    The Spark side must reproduce them through the distributed
    Arrow/mapInPandas encode+decode path, so either-side drift fails
    the contract run."""
    rows = [
        f"({mid}, {w}, {h}, {nb}, {mean!r})"
        for mid, w, h, nb, mean in PROGRESSIVE_FEATURE_TRUTH
    ]
    values = ",\n               ".join(rows)
    return f"""
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(width AS INT) AS width,
               CAST(height AS INT) AS height,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(mean_byte AS DOUBLE) AS mean_byte
        FROM (VALUES {values})
             AS t(media_id, width, height, n_bytes, mean_byte)
    """


def _basket_pairs_prologue() -> str:
    """Shared co-purchase oracle prologue: distinct (basket, item)
    pairs, the <=32-item basket bound, and the support>=2 pair
    aggregation — every CTE pinned ``MATERIALIZED``.  Without the
    pin, DuckDB inlines each multiply-referenced CTE into its
    consumers (``pairs`` twice under the bidirectional union,
    ``bounded`` twice under that, ``items`` twice again), so the
    61M-row DISTINCT-over-lineitem subtree is planned up to 8x and
    the concurrent duplicate pipelines overflowed the sweep's 24 GB
    temp budget at the heaps2 decade — while each stage computed
    once runs in seconds (engine side was always fine).  Single-scan
    semantics, identical results."""
    return """
            WITH items AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
                FROM lineitem
            ),
            bounded AS MATERIALIZED (
                SELECT basket, item FROM items
                WHERE basket NOT IN (
                    SELECT basket FROM items GROUP BY 1 HAVING count(*) > 32)
            ),
            pairs AS MATERIALIZED (
                SELECT a.item AS item_a, b.item AS item_b,
                       count(*) AS support
                FROM bounded a
                JOIN bounded b ON a.basket = b.basket AND a.item < b.item
                GROUP BY 1, 2
                HAVING count(*) >= 2
            )"""


def _knn_cross_join_oracle(k: int = 3) -> str:
    """Replays the cross-set blocked kNN (batch = the 512 lowest
    vec_ids with vec_id % 10 == 7, vs the rest): frozen-quantizer assignment of both sides, cell-equi
    candidates across sets, exact 6-dp re-rank per query."""
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        _py_sqnorm,
    )

    norms = [_py_sqnorm(c) for c in CENTROIDS]
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    return f"""
        WITH p AS (SELECT {_duck_matrix(CENTROIDS)} AS cm, {_duck_dvec(norms)} AS cn),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range({len(CENTROIDS)})) AS cell) cells
        ),
        ranked_cells AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked_cells WHERE rk = 1),
        qsel AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 7
                 ORDER BY vec_id LIMIT 512){_duck_rerank_sql(
        "cand AS (SELECT a.nid AS qid, b.nid FROM assign a "
        "JOIN assign b USING (cell) "
        "WHERE a.nid IN (SELECT vec_id FROM qsel) AND b.nid % 10 <> 7)", k)}
    """


def _margin_mining_cross_oracle(
    k: int = 3, min_margin_ppm: int = 1_000_000
) -> str:
    """Replays margin_mining_cross end-to-end: frozen-quantizer
    assignment of BOTH sides (batch = the 512 lowest vec_ids with
    vec_id % 10 == 7, corpus = the rest), cell-equi candidates in each direction, 6-dp re-rank per
    (direction, query), per-side integer neighborhood sums, and the
    same all-integer ppm margin as the within-corpus oracle (``//`` ==
    Spark ``div`` on the non-negative operands the sim6 > 0 / den > 0
    filters guarantee)."""
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        _py_sqnorm,
    )

    norms = [_py_sqnorm(c) for c in CENTROIDS]
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    dot_pair = (
        "list_sum(list_transform(range(1, len(qa.embedding)+1),"
        " i -> qa.embedding[i]::DOUBLE * nb.embedding[i]::DOUBLE))"
    )
    return f"""
        WITH p AS (SELECT {_duck_matrix(CENTROIDS)} AS cm, {_duck_dvec(norms)} AS cn),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range({len(CENTROIDS)})) AS cell) cells
        ),
        ranked_cells AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked_cells WHERE rk = 1),
        qsel AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 7
                 ORDER BY vec_id LIMIT 512),
        aa AS (SELECT nid, cell FROM assign
               WHERE nid IN (SELECT vec_id FROM qsel)),
        bb AS (SELECT nid, cell FROM assign WHERE nid % 10 <> 7),
        cand AS (
            SELECT 0 AS dir, a.nid AS qid, b.nid AS cid
            FROM aa a JOIN bb b USING (cell)
            UNION ALL
            SELECT 1 AS dir, b.nid AS qid, a.nid AS cid
            FROM aa a JOIN bb b USING (cell)
        ),
        scored AS (
            SELECT c.dir, c.qid AS query_id, c.cid AS neighbor_id,
                   round({dot_pair} / sqrt(qa.sq * nb.sq), 6) AS sim
            FROM cand c
            JOIN e qa ON qa.vec_id = c.qid
            JOIN e nb ON nb.vec_id = c.cid
        ),
        s AS (
            SELECT dir, query_id, neighbor_id, sim,
                   CAST(round(sim * 1000000) AS BIGINT) AS sim6
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY dir, query_id
                           ORDER BY sim DESC, neighbor_id ASC) AS rank
                FROM scored
            ) WHERE rank <= {k}
        ),
        dega AS (SELECT query_id, CAST(sum(sim6) AS BIGINT) AS dq6,
                        count(*) AS nq
                 FROM s WHERE dir = 0 GROUP BY 1),
        degb AS (SELECT query_id AS neighbor_id,
                        CAST(sum(sim6) AS BIGINT) AS dn6, count(*) AS nn_
                 FROM s WHERE dir = 1 GROUP BY 1),
        m AS (
            SELECT f.query_id, f.neighbor_id, f.sim, f.sim6,
                   da.dq6 * db.nn_ + db.dn6 * da.nq AS den,
                   da.nq AS nq, db.nn_ AS nn_
            FROM s f
            JOIN dega da ON da.query_id = f.query_id
            JOIN degb db ON db.neighbor_id = f.neighbor_id
            WHERE f.dir = 0 AND f.sim6 > 0
        )
        SELECT query_id, neighbor_id, sim,
               CAST((2000000 * sim6 * nq * nn_) // den AS BIGINT)
                   AS margin_ppm
        FROM m
        WHERE den > 0
          AND (2000000 * sim6 * nq * nn_) // den >= {min_margin_ppm}
    """


def _semantic_dedup_oracle(threshold: float = 0.3) -> str:
    """Replays SemDeDup: frozen-quantizer assignment, intra-cell pairs
    >= threshold, greedy lower-id-survives pruning."""
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        _py_sqnorm,
    )

    norms = [_py_sqnorm(c) for c in CENTROIDS]
    sq = _DUCK_SQ.format(v="embedding")
    dot_cent = (
        "list_sum(list_transform(range(1, len(embedding)+1),"
        " i -> embedding[i]::DOUBLE * cm[cell + 1][i]))"
    )
    dot_pair = (
        "list_sum(list_transform(range(1, len(qa.embedding)+1),"
        " i -> qa.embedding[i]::DOUBLE * nb.embedding[i]::DOUBLE))"
    )
    return f"""
        WITH p AS (SELECT {_duck_matrix(CENTROIDS)} AS cm, {_duck_dvec(norms)} AS cn),
        e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        scored_cells AS (
            SELECT vec_id, cell,
                   round({dot_cent} / sqrt(sq * cn[cell + 1]), 6) AS s
            FROM e CROSS JOIN p
            CROSS JOIN (SELECT unnest(range({len(CENTROIDS)})) AS cell) cells
        ),
        ranked AS (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell DESC) AS rk
            FROM scored_cells
        ),
        assign AS (SELECT vec_id AS nid, cell FROM ranked WHERE rk = 1),
        close AS (
            SELECT a.nid AS id_a, b.nid AS id_b
            FROM assign a JOIN assign b USING (cell)
            JOIN e qa ON qa.vec_id = a.nid
            JOIN e nb ON nb.vec_id = b.nid
            WHERE a.nid < b.nid
              AND round({dot_pair} / sqrt(qa.sq * nb.sq), 6) >= {threshold}
        ),
        drops AS (SELECT DISTINCT id_b FROM close),
        absorbed AS (
            SELECT id_a, count(*) AS kept_of FROM close
            WHERE id_a NOT IN (SELECT id_b FROM drops)
            GROUP BY 1
        )
        SELECT a.nid AS vec_id, CAST(a.cell AS BIGINT) AS cell,
               CAST(coalesce(ab.kept_of, 0) AS BIGINT) AS kept_of
        FROM assign a
        LEFT JOIN absorbed ab ON ab.id_a = a.nid
        WHERE a.nid NOT IN (SELECT id_b FROM drops)
    """


def _embedding_neardup_lsh_oracle(threshold: float = 0.3) -> str:
    """Replicates the auto_bits LSH path: bits-per-table from the
    lsh_auto_bits integer ladder (CASE on count(*)), 4 disjoint
    bits-wide plane windows, bucket = table*2^16 + local bits (the
    offset only needs to separate tables; grouping is identical to the
    engine's (t << b) | bits keys)."""
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        plane_coeffs,
    )

    max_bits, num_tables = 16, 4
    planes = plane_coeffs(max_bits * num_tables, 64)
    # integer CASE ladder == lsh_auto_bits(n): smallest b in [4,16]
    # with n <= 125 * 2^b
    ladder = " ".join(
        f"WHEN c <= {125 * (1 << b)} THEN {b}" for b in range(4, 16)
    )
    pw = "[" + ", ".join(str(1 << j) for j in range(max_bits)) + "]"
    sq = _DUCK_SQ.format(v="embedding")
    dot = (
        "list_sum(list_transform(range(1, len(a.embedding)+1),"
        " i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding, {sq} AS sq FROM embeddings),
        params AS (
            SELECT CASE {ladder} ELSE 16 END AS b
            FROM (SELECT count(*) AS c FROM embeddings)
        ),
        pl AS (SELECT {_duck_matrix(planes)} AS m),
        bits AS (
            SELECT e.vec_id,
                   list_transform(range({num_tables} * p.b),
                       q -> CASE WHEN list_sum(list_transform(range(1, 65),
                                 i -> e.embedding[i]::DOUBLE * (pl.m)[q + 1][i]))
                                 > 0 THEN 1 ELSE 0 END) AS bv
            FROM e CROSS JOIN params p CROSS JOIN pl
        ),
        posting AS (
            SELECT vec_id AS doc,
                   tt.t * 65536
                   + list_sum(list_transform(range(p.b),
                         j -> bv[tt.t * p.b + j + 1] * {pw}[j + 1])) AS bucket
            FROM bits CROSS JOIN params p
            CROSS JOIN (SELECT unnest(range({num_tables})) AS t) tt
        ),
        cand AS (
            SELECT DISTINCT p1.doc AS id_a, p2.doc AS id_b
            FROM posting p1 JOIN posting p2 USING (bucket)
            WHERE p1.doc < p2.doc
        )
        SELECT id_a, id_b, sim FROM (
            SELECT c.id_a, c.id_b,
                   round({dot} / sqrt(a.sq * b.sq), 6) AS sim
            FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b
        ) WHERE sim >= {threshold}
    """


# --- fake-media oracle generators ------------------------------------------
# synthesize_media_table content is a pure function of media_id
# (functions/multimodal.py:59-65): 8-byte header (two uint32 LE dims,
# dims < 256 so bytes are [w,0,0,0,h,0,0,0]) + payload[i] = (id*31+i)%256
# of length (w*h)%4096.  The oracles rebuild those bytes with range().

_DUCK_MEDIA_CTE = """
        m AS (
            SELECT CAST(i AS BIGINT) AS media_id,
                   CAST(((i % 16) + 1) * 8 AS INT) AS width,
                   CAST(((i % 9) + 1) * 8 AS INT) AS height
            FROM range({n}) t(i)
        ),
        d AS (SELECT media_id, width, height,
                     (width * height) % 4096 AS plen FROM m)
"""


def _image_features_oracle(n: int = 64) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        ex AS (SELECT media_id, unnest(range(plen)) AS j FROM d),
        s AS (SELECT media_id, sum((media_id * 31 + j) % 256) AS ssum,
                     count(*) AS cnt
              FROM ex GROUP BY 1)
        SELECT d.media_id, d.width, d.height,
               CAST(8 + d.plen AS BIGINT) AS n_bytes,
               coalesce(CAST(s.ssum AS DOUBLE) / s.cnt, 0.0) AS mean_byte
        FROM d LEFT JOIN s USING (media_id)
    """


_DUCK_PHASH_CTE = """
        ex AS (SELECT media_id, plen, unnest(range(plen)) AS j
               FROM d WHERE plen > 0),
        by_cell AS (
            SELECT media_id, plen, (j * 60) // plen AS cell,
                   sum((media_id * 31 + j) % 256) AS csum,
                   count(*) AS cn
            FROM ex GROUP BY 1, 2, 3
        ),
        tot AS (SELECT media_id, sum(csum) AS total FROM by_cell GROUP BY 1),
        bits AS (
            SELECT b.media_id, b.cell,
                   CASE WHEN b.csum * b.plen > t.total * b.cn
                        THEN 1 ELSE 0 END AS bit
            FROM by_cell b JOIN tot t USING (media_id)
        ),
        hashed AS (
            SELECT media_id,
                   CAST(sum(CASE WHEN bit = 1
                                 THEN (CAST(1 AS BIGINT) << CAST(cell AS INT))
                                 ELSE 0 END) AS BIGINT) AS phash,
                   CAST(sum(bit) AS INT) AS n_ones
            FROM bits GROUP BY 1
        ),
        ph AS (
            SELECT d.media_id, CAST(d.plen AS BIGINT) AS plen,
                   coalesce(h.phash, 0) AS phash,
                   CAST(coalesce(h.n_ones, 0) AS INT) AS n_ones
            FROM d LEFT JOIN hashed h USING (media_id)
        )
"""


def _image_phash_oracle(n: int = 64) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        {_DUCK_PHASH_CTE}
        SELECT media_id, plen, phash, n_ones FROM ph
    """


def _image_clusters_oracle(n: int = 64, max_hamming: int = 14) -> str:
    """Cross-check of the CC engine over phash pairs: recursive
    reachability from the same fake-media + phash CTEs."""
    return f"""
        WITH RECURSIVE {_DUCK_MEDIA_CTE.format(n=n)},
        {_DUCK_PHASH_CTE},
        p AS (
            SELECT a.media_id AS id_a, b.media_id AS id_b
            FROM ph a JOIN ph b ON a.media_id < b.media_id
            WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
        ),
        e AS (
            SELECT id_a AS src, id_b AS dst FROM p
            UNION
            SELECT id_b, id_a FROM p
        ),
        reach(src, node) AS (
            SELECT media_id, media_id FROM d
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.node = e.src
        )
        SELECT src AS media_id, min(node) AS cluster_id
        FROM reach GROUP BY 1
    """


def _image_phash_pairs_oracle(n: int = 64, max_hamming: int = 14) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        {_DUCK_PHASH_CTE}
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM ph a JOIN ph b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
    """


def _image_resize_features_oracle(n: int = 64, tw: int = 32, th: int = 32) -> str:
    new_len = (tw * th) % 4096
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        pay AS (
            SELECT media_id,
                   list_transform(range(plen),
                                  j -> CAST((media_id * 31 + j) % 256 AS INT)) AS p,
                   plen
            FROM d
        ),
        res AS (
            SELECT media_id,
                   CASE WHEN plen > 0 AND {new_len} > 0
                        THEN list_transform(range({new_len}),
                                            i -> p[CAST((i * plen) // {new_len} AS INT) + 1])
                        ELSE [] END AS rp
            FROM pay
        )
        SELECT media_id, CAST({tw} AS INT) AS width, CAST({th} AS INT) AS height,
               CAST(8 + len(rp) AS BIGINT) AS n_bytes,
               CASE WHEN len(rp) = 0 THEN 0.0
                    ELSE CAST(list_sum(rp) AS DOUBLE) / len(rp) END AS mean_byte
        FROM res
    """


def _audio_features_oracle(n: int = 64) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        smp AS (
            SELECT media_id,
                   list_concat([width, 0, 0, 0, height, 0, 0, 0],
                               list_transform(range(plen),
                                              j -> CAST((media_id * 31 + j) % 256 AS INT))) AS vals
            FROM d
        ),
        x AS (SELECT media_id,
                     list_transform(vals, v -> (CAST(v AS DOUBLE) - 128.0) / 128.0) AS xs
              FROM smp)
        SELECT media_id, CAST(len(xs) AS BIGINT) AS n_samples,
               round(sqrt(list_sum(list_transform(xs, v -> v * v)) / len(xs)), 6) AS rms,
               list_max(list_transform(xs, v -> abs(v))) AS peak
        FROM x
    """


def _audio_fingerprint_oracle(n: int = 64, n_cells: int = 61) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        smp AS (
            SELECT media_id,
                   list_concat([width, 0, 0, 0, height, 0, 0, 0],
                               list_transform(range(plen),
                                              j -> CAST((media_id * 31 + j) % 256 AS INT))) AS vals
            FROM d
        ),
        ex AS (
            SELECT media_id, generate_subscripts(vals, 1) AS j1,
                   unnest(vals) AS v, len(vals) AS n
            FROM smp
        ),
        cells AS (
            SELECT media_id, ((j1 - 1) * {n_cells}) // n AS cell,
                   sum((v - 128) * (v - 128)) AS e
            FROM ex GROUP BY 1, 2
        ),
        grid AS (
            SELECT s.media_id, g.c AS cell
            FROM smp s CROSS JOIN (SELECT unnest(range({n_cells})) AS c) g
        ),
        eng AS (
            SELECT g.media_id, g.cell, coalesce(cells.e, 0) AS e
            FROM grid g LEFT JOIN cells USING (media_id, cell)
        ),
        bits AS (
            SELECT a.media_id, a.cell AS c,
                   CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
            FROM eng a
            JOIN eng b ON a.media_id = b.media_id AND b.cell = a.cell + 1
            WHERE a.cell < {n_cells - 1}
        ),
        fp AS (
            SELECT media_id,
                   CAST(sum(CASE WHEN bit = 1
                                 THEN (CAST(1 AS BIGINT) << CAST(c AS INT))
                                 ELSE 0 END) AS BIGINT) AS fingerprint,
                   CAST(sum(bit) AS INT) AS n_ones
            FROM bits GROUP BY 1
        )
        SELECT s.media_id, CAST(len(s.vals) AS BIGINT) AS n_samples,
               fp.fingerprint, fp.n_ones
        FROM smp s JOIN fp USING (media_id)
    """


def _scene_cuts_oracle(n: int = 64, every: int = 256, max_frames: int = 4) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        smp AS (
            SELECT media_id,
                   list_concat([width, 0, 0, 0, height, 0, 0, 0],
                               list_transform(range(plen),
                                              j -> CAST((media_id * 31 + j) % 256 AS INT))) AS vals
            FROM d
        ),
        fr AS (
            SELECT media_id, len(vals) AS nb,
                   least({max_frames}, greatest(1, len(vals) // {every}))
                       AS n_frames,
                   unnest(range(least({max_frames},
                                      greatest(1, len(vals) // {every})))) AS fi,
                   vals
            FROM smp
        ),
        eng AS (
            SELECT media_id, n_frames, fi,
                   list_sum(list_transform(
                       list_slice(vals, fi * {every} + 1,
                                  least((fi + 1) * {every}, nb)),
                       v -> (v - 128) * (v - 128))) AS e
            FROM fr
        ),
        lagged AS (
            SELECT media_id, n_frames, fi, e,
                   lag(e) OVER (PARTITION BY media_id ORDER BY fi) AS e_prev
            FROM eng
        ),
        cuts AS (
            SELECT media_id,
                   CAST(max(n_frames) AS INT) AS n_frames,
                   CAST(sum(CASE WHEN fi > 0
                                  AND 4 * abs(e - e_prev) > e_prev
                                 THEN 1 ELSE 0 END) AS INT) AS n_cuts,
                   CAST(coalesce(min(CASE WHEN fi > 0
                                           AND 4 * abs(e - e_prev) > e_prev
                                          THEN fi END), -1) AS BIGINT)
                       AS first_cut
            FROM lagged GROUP BY 1
        )
        SELECT media_id, n_frames, n_cuts, first_cut FROM cuts
    """


def _frame_samples_oracle(n: int = 64, every: int = 256, max_frames: int = 4) -> str:
    return f"""
        WITH {_DUCK_MEDIA_CTE.format(n=n)},
        smp AS (
            SELECT media_id,
                   list_concat([width, 0, 0, 0, height, 0, 0, 0],
                               list_transform(range(plen),
                                              j -> CAST((media_id * 31 + j) % 256 AS INT))) AS vals
            FROM d
        ),
        fr AS (
            SELECT media_id, vals, len(vals) AS nb,
                   unnest(range(least({max_frames},
                                      greatest(1, len(vals) // {every})))) AS fi
            FROM smp
        ),
        cut AS (
            SELECT media_id, CAST(fi AS INT) AS frame_index,
                   list_slice(vals, fi * {every} + 1,
                              least((fi + 1) * {every}, nb)) AS fb
            FROM fr
        )
        SELECT media_id, frame_index, CAST(len(fb) AS BIGINT) AS n_bytes,
               array_to_string(list_transform(fb, v -> printf('%02X', v)), '') AS frame_hex
        FROM cut
    """


_QUALITY_FLAGS_SQL = r"""
    WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    l AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM t),
    lstats AS (
        SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
               round(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls), 6)
                   AS dup_line_frac
        FROM l
    ),
    tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term FROM t),
    tc AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
    td AS (SELECT doc_id, sum(c) AS tok_total, max(c) AS tok_top,
                  sum(len(term) * c) AS tok_len
           FROM tc GROUP BY 1),
    ta AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS tt FROM t),
    bg AS (SELECT doc_id,
                  unnest(CASE WHEN len(tt) >= 2
                         THEN list_transform(range(1, len(tt)), i -> tt[i] || ' ' || tt[i+1])
                         ELSE [array_to_string(tt, ' ')] END) AS term
           FROM ta),
    bc AS (SELECT doc_id, term, count(*) AS c FROM bg GROUP BY 1, 2),
    bd AS (SELECT doc_id, sum(c) AS bg_total, max(c) AS bg_top FROM bc GROUP BY 1)
    SELECT ls.doc_id, ls.n_lines, ls.dup_line_frac,
           CAST(td.tok_total AS BIGINT) AS n_tokens,
           round(CAST(td.tok_top AS DOUBLE) / td.tok_total, 6) AS top_token_frac,
           round(CAST(bd.bg_top AS DOUBLE) / bd.bg_total, 6) AS top_bigram_frac,
           round(CAST(td.tok_len AS DOUBLE) / td.tok_total, 6) AS mean_token_len,
           (td.tok_total >= 50 AND td.tok_total <= 100000
            AND round(CAST(td.tok_top AS DOUBLE) / td.tok_total, 6) <= 0.20
            AND round(CAST(bd.bg_top AS DOUBLE) / bd.bg_total, 6) <= 0.18
            AND ls.dup_line_frac <= 0.30
            AND round(CAST(td.tok_len AS DOUBLE) / td.tok_total, 6) >= 3.0
            AND round(CAST(td.tok_len AS DOUBLE) / td.tok_total, 6) <= 10.0)
               AS passes_quality
    FROM lstats ls JOIN td ON td.doc_id = ls.doc_id JOIN bd ON bd.doc_id = ls.doc_id
"""


_HEAVY_HITTERS_SQL = r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(coalesce(text, ''), '\s+')) AS term
        FROM documents
    ),
    ex AS (SELECT term, count(*) AS n_exact FROM tok GROUP BY 1),
    topk AS (
        SELECT term, n_exact, rank FROM (
            SELECT term, n_exact,
                   row_number() OVER (ORDER BY n_exact DESC, term ASC) AS rank
            FROM ex
        ) WHERE rank <= 50
    ),
    lanes AS (
        SELECT lane, bucket, count(*) AS cnt FROM (
            SELECT j AS lane,
                   CAST('0x' || substr(md5('cm' || j || ':' || term), 1, 15)
                        AS BIGINT) % 512 AS bucket
            FROM tok, (SELECT unnest([0, 1, 2, 3]) AS j) js
        ) GROUP BY 1, 2
    ),
    probes AS (
        SELECT t.term, t.n_exact, t.rank, j AS lane,
               CAST('0x' || substr(md5('cm' || j || ':' || t.term), 1, 15)
                    AS BIGINT) % 512 AS bucket
        FROM topk t, (SELECT unnest([0, 1, 2, 3]) AS j) js
    )
    SELECT CAST(p.rank AS BIGINT) AS rank, p.term, p.n_exact,
           min(l.cnt) AS n_est, min(l.cnt) - p.n_exact AS overcount
    FROM probes p JOIN lanes l ON l.lane = p.lane AND l.bucket = p.bucket
    GROUP BY 1, 2, 3
"""

_REPETITION_STATS_SQL = r"""
    WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    lo AS (SELECT doc_id, unnest(str_split(text, chr(10))) AS line FROM t),
    lc AS (SELECT doc_id, line, count(*) AS c FROM lo GROUP BY 1, 2),
    ls AS (
        SELECT doc_id, sum(len(line) * c) AS line_chars,
               sum(CASE WHEN c > 1 THEN len(line) * c ELSE 0 END) AS dup_line_chars
        FROM lc GROUP BY 1
    ),
    ta AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS tt FROM t),
    g AS (
        SELECT doc_id, n,
               unnest(CASE WHEN len(tt) >= n
                      THEN list_transform(range(1, len(tt) - n + 2),
                                          i -> array_to_string(list_slice(tt, i, i + n - 1), ' '))
                      ELSE [array_to_string(tt, ' ')] END) AS gram
        FROM ta, (SELECT unnest([2, 3, 5]) AS n) ns
    ),
    gc AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
    gn AS (
        SELECT doc_id, n, sum(len(gram) * c) AS total_chars,
               sum(CASE WHEN c > 1 THEN len(gram) * c ELSE 0 END) AS dup_chars
        FROM gc GROUP BY 1, 2
    ),
    gtop AS (
        SELECT doc_id, n, len(gram) * c AS top_chars
        FROM (SELECT doc_id, n, gram, c,
                     row_number() OVER (PARTITION BY doc_id, n
                                        ORDER BY c DESC, gram DESC) AS rn
              FROM gc) WHERE rn = 1
    ),
    p AS (
        SELECT gn.doc_id,
               max(CASE WHEN gn.n = 2 THEN
                   CASE WHEN gn.total_chars > 0
                        THEN round(CAST(gt.top_chars AS DOUBLE) / gn.total_chars, 6)
                        ELSE 0.0 END END) AS top_2gram_char_frac,
               max(CASE WHEN gn.n = 3 THEN
                   CASE WHEN gn.total_chars > 0
                        THEN round(CAST(gt.top_chars AS DOUBLE) / gn.total_chars, 6)
                        ELSE 0.0 END END) AS top_3gram_char_frac,
               max(CASE WHEN gn.n = 5 THEN
                   CASE WHEN gn.total_chars > 0
                        THEN round(CAST(gn.dup_chars AS DOUBLE) / gn.total_chars, 6)
                        ELSE 0.0 END END) AS dup_5gram_char_frac
        FROM gn JOIN gtop gt ON gt.doc_id = gn.doc_id AND gt.n = gn.n
        GROUP BY 1
    )
    SELECT ls.doc_id,
           CASE WHEN ls.line_chars > 0
                THEN round(CAST(ls.dup_line_chars AS DOUBLE) / ls.line_chars, 6)
                ELSE 0.0 END AS dup_line_char_frac,
           p.top_2gram_char_frac, p.top_3gram_char_frac, p.dup_5gram_char_frac,
           (CASE WHEN ls.line_chars > 0
                 THEN round(CAST(ls.dup_line_chars AS DOUBLE) / ls.line_chars, 6)
                 ELSE 0.0 END <= 0.20
            AND p.top_2gram_char_frac <= 0.20
            AND p.top_3gram_char_frac <= 0.18
            AND p.dup_5gram_char_frac <= 0.15) AS passes_repetition
    FROM ls JOIN p ON p.doc_id = ls.doc_id
"""

_BUDGET_SAMPLE_SQL = """
    WITH ranked AS (
        SELECT doc_id, source AS stratum, CAST(n_chars AS BIGINT) AS cost,
               CAST('0x' || substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hk,
               CASE source WHEN 'src0' THEN 40000 WHEN 'src1' THEN 80000
                           WHEN 'src2' THEN 20000 END AS budget
        FROM documents
    ),
    cum AS (
        SELECT doc_id, stratum, cost, budget,
               sum(cost) OVER (PARTITION BY stratum ORDER BY hk, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cost
        FROM ranked
    )
    SELECT doc_id, stratum, cost, CAST(cum_cost AS BIGINT) AS cum_cost
    FROM cum
    WHERE budget IS NOT NULL AND cum_cost - cost < budget
"""

_DOMAIN_CAPS_SQL = """
    WITH r AS (
        SELECT doc_id, source AS domain,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)
                                 AS BIGINT),
                            doc_id
               ) AS domain_rank
        FROM documents
    )
    SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank
    FROM r WHERE domain_rank <= 15
"""


_REPEATED_SPANS_SQL = r"""
            WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
            occ AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, length(t) - 14),
                           i -> CAST(i AS VARCHAR) || '|' ||
                                substr(t, i, 16))) AS s
                FROM d WHERE length(t) >= 16
            ),
            po AS (SELECT doc_id,
                          CAST(string_split(s, '|')[1] AS BIGINT) AS pos,
                          substr(s, strpos(s, '|') + 1) AS h
                   FROM occ),
            kept AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS df
                    FROM po
                ) WHERE df >= 2
            ),
            isl AS (
                SELECT doc_id, pos,
                       CASE WHEN lag(pos) OVER w IS NULL
                                 OR pos > lag(pos) OVER w + 16
                            THEN 1 ELSE 0 END AS nw
                FROM kept WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ),
            isl2 AS (
                SELECT doc_id, pos,
                       sum(nw) OVER (PARTITION BY doc_id ORDER BY pos)
                           AS island
                FROM isl
            )
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) - min(pos) + 16 AS BIGINT) AS span_len
            FROM isl2 GROUP BY doc_id, island
"""


_SPAN_PROBE_SQL = r"""
            WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
            occ AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, length(t) - 14),
                           i -> CAST(i AS VARCHAR) || '|' ||
                                substr(t, i, 16))) AS s
                FROM d WHERE length(t) >= 16 AND doc_id % 10 = 7
            ),
            po AS (SELECT doc_id,
                          CAST(string_split(s, '|')[1] AS BIGINT) AS pos,
                          substr(s, strpos(s, '|') + 1) AS h
                   FROM occ),
            ch AS (
                SELECT DISTINCT unnest(list_transform(
                           range(1, length(t) - 14),
                           i -> substr(t, i, 16))) AS h
                FROM d WHERE length(t) >= 16 AND doc_id % 10 <> 7
            ),
            kept AS (
                SELECT doc_id, pos FROM po
                WHERE h IN (SELECT h FROM ch)
            ),
            isl AS (
                SELECT doc_id, pos,
                       CASE WHEN lag(pos) OVER w IS NULL
                                 OR pos > lag(pos) OVER w + 16
                            THEN 1 ELSE 0 END AS nw
                FROM kept WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ),
            isl2 AS (
                SELECT doc_id, pos,
                       sum(nw) OVER (PARTITION BY doc_id ORDER BY pos)
                           AS island
                FROM isl
            )
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) - min(pos) + 16 AS BIGINT) AS span_len
            FROM isl2 GROUP BY doc_id, island
"""


def _unimax_fill_cte(budget: int, epochs: int,
                     counts_from: str = "documents") -> str:
    """The UniMax waterfilling recurrence as CTE text (``counts`` /
    ``ordered`` / ``fill``), shared by the ``unimax_allocation`` and
    ``unimax_sample`` oracles.  ``counts_from='perdoc'`` aggregates a
    pre-tokenized ``(lang, n_tokens)`` CTE instead of raw documents.
    Emitted WITHOUT the ``WITH RECURSIVE`` keyword (the caller owns
    the WITH list)."""
    src = (
        f"SELECT lang, CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS"
        " n_tokens FROM documents GROUP BY 1"
        if counts_from == "documents"
        else f"SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS n_tokens"
             f" FROM {counts_from} GROUP BY 1"
    )
    return f"""counts AS ({src}),
            ordered AS (
                SELECT lang, n_tokens, n_tokens * {epochs} AS cap,
                       row_number() OVER (
                           ORDER BY n_tokens * {epochs}, lang) AS rn,
                       count(*) OVER () AS m
                FROM counts
            ),
            fill AS (
                SELECT 0 AS rn, CAST(NULL AS VARCHAR) AS lang,
                       CAST(NULL AS BIGINT) AS n_tokens,
                       CAST(NULL AS BIGINT) AS cap,
                       CAST(NULL AS BIGINT) AS alloc,
                       CAST({budget} AS BIGINT) AS remaining
                UNION ALL
                SELECT o.rn, o.lang, o.n_tokens, o.cap,
                       least(o.cap, f.remaining // (o.m - o.rn + 1)),
                       f.remaining
                           - least(o.cap,
                                   f.remaining // (o.m - o.rn + 1))
                FROM fill f JOIN ordered o ON o.rn = f.rn + 1
            )"""


def _span_cut_stitch_oracle(spans_sql: str, doc_where: str = "") -> str:
    """The complement-segment stitch shared by the ``span_cut`` (all
    occurrences), ``span_cut_keep_one`` (non-survivor occurrences
    only) and ``span_cut_probe`` (batch docs vs standing corpus)
    oracles: lag of each span's end yields the segment before it, one
    tail segment per doc, ordered string_agg stitches, docs without
    spans pass through via the left joins.  ``doc_where`` narrows the
    OUTPUT doc set (the spans subquery filters itself)."""
    return f"""
        WITH spans AS (SELECT * FROM ({spans_sql})),
        d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents
              {doc_where}),
        pre AS (
            SELECT doc_id,
                   coalesce(lag(span_start + span_len)
                            OVER (PARTITION BY doc_id
                                  ORDER BY span_start), 1) AS seg_start,
                   span_start AS nxt
            FROM spans
        ),
        tail AS (
            SELECT doc_id, max(span_start + span_len) AS seg_start,
                   count(*) AS n_cut,
                   CAST(sum(span_len) AS BIGINT) AS cut_chars
            FROM spans GROUP BY 1
        ),
        segs AS (
            SELECT doc_id, seg_start, nxt - seg_start AS seg_len
            FROM pre
            UNION ALL
            SELECT t.doc_id, t.seg_start,
                   greatest(0, length(d.t) - t.seg_start + 1)
            FROM tail t JOIN d USING (doc_id)
        ),
        stitched AS (
            SELECT s.doc_id,
                   string_agg(substr(d.t, CAST(s.seg_start AS INT),
                                     CAST(greatest(0, s.seg_len) AS INT)),
                              '' ORDER BY s.seg_start) AS clean_text
            FROM segs s JOIN d USING (doc_id)
            GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(st.clean_text, d.t) AS clean_text,
               CAST(coalesce(t.n_cut, 0) AS BIGINT) AS n_cut,
               CAST(coalesce(t.cut_chars, 0) AS BIGINT) AS cut_chars
        FROM d
        LEFT JOIN stitched st USING (doc_id)
        LEFT JOIN tail t USING (doc_id)
    """


def oracle_sql() -> dict[str, str]:
    oracles = {
        # NB: DuckDB 1.0 mis-evaluates `ts::date IN (DATE ...)` on this
        # nanosecond-timestamp column (returns false for matching rows);
        # equality comparisons work, so the oracles use OR-of-equalities.
        "price_change": f"""
            WITH pivoted AS (
                SELECT event_type AS symbol,
                       max(CASE WHEN ts::date = DATE '{DATE_A}' THEN value END) AS price_a,
                       max(CASE WHEN ts::date = DATE '{DATE_B}' THEN value END) AS price_b
                FROM events
                WHERE ts::date = DATE '{DATE_A}' OR ts::date = DATE '{DATE_B}'
                GROUP BY 1
            )
            SELECT symbol, price_a, price_b,
                   round((price_b - price_a) / price_a * 100, 6) AS pct_change
            FROM pivoted
            WHERE round((price_b - price_a) / price_a * 100, 6) > 3
        """,
        "daily_ohlc": f"""
            SELECT event_type AS symbol, ts::date AS trade_date,
                   {_OHLC_AGGS},
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_volume,
                   count(*) AS n_ticks
            FROM events GROUP BY 1, 2
        """,
        "hourly_ohlc": f"""
            SELECT event_type AS symbol,
                   time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
                   {_OHLC_AGGS},
                   count(*) AS n_ticks
            FROM events GROUP BY 1, 2
        """,
        "resample_5min": f"""
            SELECT event_type AS symbol,
                   time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
                   {_OHLC_AGGS},
                   count(*) AS n_ticks
            FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
                         AND TIMESTAMP '2024-01-10 00:00:00'
              AND event_type IN ('click', 'purchase')
            GROUP BY 1, 2
        """,
        "events_clean": r"""
            SELECT event_id,
                   upper(regexp_replace(event_type, '_v\d+$', '')) AS symbol,
                   ts AS event_ts,
                   ts::date AS event_date,
                   TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS prop_k,
                   value
            FROM events
        """,
        # invalid_rows / validity_summary: the dirt is manufactured
        # in-flight (_dirty_lineitem — fixtures ship zero invalid
        # measures at every SF); the oracle replays the same shim
        "invalid_rows": """
            WITH li AS (
                SELECT l_orderkey, l_linenumber,
                       CASE WHEN l_orderkey % 1000 = 7 THEN NULL
                            ELSE l_quantity END AS l_quantity,
                       l_extendedprice, l_discount,
                       CASE WHEN l_orderkey % 1000 = 13 THEN -1.0
                            ELSE l_tax END AS l_tax
                FROM lineitem
            )
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM li
            WHERE l_quantity IS NULL OR l_quantity < 0
               OR l_extendedprice IS NULL OR l_extendedprice < 0
               OR l_discount IS NULL OR l_discount < 0
               OR l_tax IS NULL OR l_tax < 0
        """,
        "validity_summary": """
            WITH li AS (
                SELECT l_returnflag,
                       CASE WHEN l_orderkey % 1000 = 7 THEN NULL
                            ELSE l_quantity END AS l_quantity,
                       l_extendedprice, l_discount,
                       CASE WHEN l_orderkey % 1000 = 13 THEN -1.0
                            ELSE l_tax END AS l_tax
                FROM lineitem
            )
            SELECT l_returnflag AS group_key,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 0
                             OR l_extendedprice IS NULL OR l_extendedprice < 0
                             OR l_discount IS NULL OR l_discount < 0
                             OR l_tax IS NULL OR l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
            FROM li GROUP BY 1
        """,
        # missing_symbols: gap manufactured by dropping customers of
        # nationkey % 7 == 3 (fixtures cover all nations at every SF)
        "missing_symbols": """
            SELECT n.* FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_nationkey = n.n_nationkey
                                AND c.c_nationkey % 7 <> 3)
        """,
        "ohlc_reconcile": f"""
            WITH day AS (SELECT * FROM events WHERE ts::date = DATE '2024-01-15'),
            agg AS (
                SELECT event_type AS symbol, ts::date AS trade_date, {_OHLC_AGGS}
                FROM day GROUP BY 1, 2
            )
            SELECT a.symbol, a.trade_date, a.open, a.high, a.low, a.close,
                   g.open AS golden_open, g.high AS golden_high,
                   g.low AS golden_low, g.close AS golden_close,
                   round(a.open - g.open, 6) AS open_diff,
                   round(a.high - g.high, 6) AS high_diff,
                   round(a.low - g.low, 6) AS low_diff,
                   round(a.close - g.close, 6) AS close_diff
            FROM agg a JOIN agg g ON a.symbol = g.symbol
        """,
        "asof_hourly_close": """
            WITH hourly AS (
                SELECT event_type AS symbol,
                       time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
                       arg_max(value, ts) AS close
                FROM events GROUP BY 1, 2
            )
            SELECT e.event_type AS symbol, e.ts, e.event_id, e.value,
                   h.close AS hourly_close
            FROM events e ASOF LEFT JOIN hourly h
              ON e.event_type = h.symbol AND e.ts >= h.bucket_start
        """,
        "asof_next_close": """
            WITH hourly AS (
                SELECT event_type AS symbol,
                       time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
                       arg_max(value, ts) AS close
                FROM events GROUP BY 1, 2
            )
            SELECT e.event_type AS symbol, e.ts, e.event_id, e.value,
                   h.close AS next_close
            FROM events e ASOF LEFT JOIN hourly h
              ON e.event_type = h.symbol AND e.ts <= h.bucket_start
        """,
        "distinct_symbols": "SELECT DISTINCT event_type FROM events",
        # gaps-and-islands replay of F.session_window: sessions merge
        # while the gap is <= 30 minutes (touching windows merge), so a
        # new session starts iff the gap is STRICTLY greater;
        # session_end is last_ts + gap (Spark's native semantics)
        # k_anonymity: adaptive k — classes strictly below the MEAN
        # class size, cross-multiplied exact integers (n*m < tot)
        "k_anonymity": """
            WITH cls AS (
                SELECT c_nationkey, c_mktsegment,
                       CAST(floor(c_acctbal / 1000) AS BIGINT)
                           AS balance_band,
                       count(*) AS n_rows
                FROM customer GROUP BY 1, 2, 3
            ),
            t AS (SELECT count(*) AS m, sum(n_rows) AS tot FROM cls)
            SELECT c_nationkey, c_mktsegment, balance_band,
                   CAST(n_rows AS BIGINT) AS n_rows
            FROM cls, t WHERE n_rows * m < tot
        """,
        "active_users": """
            WITH user_days AS (
                SELECT DISTINCT user_id AS u, ts::date AS d FROM events
            ),
            dau AS (SELECT d, count(*) AS dau FROM user_days GROUP BY 1),
            contrib AS (
                SELECT u, unnest(generate_series(d::TIMESTAMP,
                       (d + INTERVAL 6 DAY)::TIMESTAMP,
                       INTERVAL 1 DAY))::DATE AS d
                FROM user_days
            ),
            wau AS (SELECT d, count(DISTINCT u) AS wau FROM contrib GROUP BY 1)
            SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau,
                   CAST(wau.wau AS BIGINT) AS wau,
                   (1000000 * dau.dau) // wau.wau AS stickiness_ppm
            FROM dau JOIN wau ON dau.d = wau.d
        """,
        "pattern_match": """
            WITH enriched AS (
                SELECT user_id, event_type, ts AS second_ts,
                       event_id AS second_event,
                       last_value(CASE WHEN event_type = 'click' THEN ts END
                                  IGNORE NULLS) OVER w AS first_ts,
                       last_value(CASE WHEN event_type = 'click' THEN event_id END
                                  IGNORE NULLS) OVER w AS first_event,
                       last_value(CASE WHEN event_type = 'error' THEN ts END
                                  IGNORE NULLS) OVER w AS c_ts,
                       last_value(CASE WHEN event_type = 'error' THEN event_id END
                                  IGNORE NULLS) OVER w AS c_tie
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, first_ts,
                   CAST(first_event AS BIGINT) AS first_event,
                   second_ts,
                   CAST(second_event AS BIGINT) AS second_event,
                   CAST(date_diff('second', first_ts, second_ts) AS BIGINT)
                       AS wait_seconds
            FROM enriched
            WHERE event_type = 'purchase'
              AND first_ts IS NOT NULL
              AND second_ts <= first_ts + INTERVAL 1 HOUR
              AND (c_ts IS NULL OR c_ts < first_ts
                   OR (c_ts = first_ts AND c_tie < first_event))
        """,
        "calendar_fill": """
            WITH ranked AS (
                SELECT event_type AS symbol, ts::date AS d, value,
                       row_number() OVER (
                           PARTITION BY event_type, ts::date
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
                WHERE date_part('day', ts) % 5 <> 0
            ),
            per_day AS (SELECT symbol, d, value AS raw_close
                        FROM ranked WHERE rn = 1),
            bounds AS (SELECT symbol, min(d) AS d0, max(d) AS d1
                       FROM per_day GROUP BY 1),
            spine AS (
                SELECT symbol,
                       unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                              INTERVAL 1 DAY))::DATE AS d
                FROM bounds
            ),
            joined AS (
                SELECT s.symbol, s.d, p.raw_close
                FROM spine s LEFT JOIN per_day p USING (symbol, d)
            )
            SELECT symbol, d,
                   last_value(raw_close IGNORE NULLS) OVER (
                       PARTITION BY symbol ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS close,
                   raw_close IS NULL AS is_filled
            FROM joined
        """,
        "max_drawdown": """
            WITH dd AS (
                SELECT event_type AS symbol, ts, event_id, value,
                       value - max(value) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS d
                FROM events
            ),
            ranked AS (
                SELECT symbol, ts, event_id, value, d,
                       row_number() OVER (
                           PARTITION BY symbol ORDER BY d, ts, event_id) AS rn
                FROM dd
            )
            SELECT symbol,
                   max(value) AS peak_value,
                   min(d) AS max_drawdown,
                   max(CASE WHEN rn = 1 THEN ts END) AS trough_ts,
                   CAST(max(CASE WHEN rn = 1 THEN event_id END) AS BIGINT)
                       AS trough_event,
                   count(*) AS n_ticks
            FROM ranked GROUP BY 1
        """,
        "event_transitions": """
            WITH pairs AS (
                SELECT event_type AS src,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS dst
                FROM events
            ),
            counts AS (
                SELECT src, dst, count(*) AS n_transitions
                FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
            ),
            totals AS (
                SELECT src, CAST(sum(n_transitions) AS BIGINT) AS total_from_src
                FROM counts GROUP BY 1
            )
            SELECT c.src, c.dst,
                   CAST(c.n_transitions AS BIGINT) AS n_transitions,
                   t.total_from_src,
                   (1000000 * c.n_transitions) // t.total_from_src AS prob_ppm
            FROM counts c JOIN totals t ON c.src = t.src
        """,
        "event_sessions": """
            WITH flagged AS (
                SELECT user_id AS symbol, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ),
            numbered AS (
                SELECT symbol, ts, value,
                       sum(new_session) OVER (PARTITION BY symbol ORDER BY ts
                                              ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            )
            SELECT symbol, min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM numbered GROUP BY symbol, sid
        """,
        "rolling_stats": """
            SELECT event_id, event_type AS symbol, ts, value,
                   count(*) OVER w AS roll_n,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS roll_sum,
                   CAST(CAST(sum(CAST(value AS DECIMAL(28,2))) OVER w
                             * 1000000 AS HUGEINT)
                        // count(*) OVER w AS BIGINT) AS roll_avg_micro
            FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                         AND TIMESTAMP '2024-01-12 00:00:00'
            WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        """,
        "expectations_report": """
            WITH agg AS (
                SELECT count(*) AS n,
                       CAST(sum(CASE WHEN NOT coalesce(value >= 0, FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS v0,
                       CAST(sum(CASE WHEN NOT coalesce(value <= 450, FALSE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS v1,
                       CAST(sum(CASE WHEN ts IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS v2,
                       CAST(sum(CASE WHEN user_id IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS v3,
                       CAST(sum(CASE WHEN NOT coalesce(event_type IN
                            ('click','error','purchase','signup','view'),
                            FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v4
                FROM events
            ),
            tall AS (
                SELECT 'value_nonnegative' AS rule, n, v0 AS v FROM agg
                UNION ALL SELECT 'value_below_cap', n, v1 FROM agg
                UNION ALL SELECT 'ts_present', n, v2 FROM agg
                UNION ALL SELECT 'user_present', n, v3 FROM agg
                UNION ALL SELECT 'event_type_known', n, v4 FROM agg
            )
            SELECT rule, n AS n_rows, v AS n_violations,
                   CAST((v * 1000000) // n AS BIGINT) AS violation_ppm,
                   v <= 0.10 * n AS passed
            FROM tall
        """,
        "daily_event_pivot": """
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view
            FROM events GROUP BY 1
        """,
        "ewma_prices": """
            WITH lags AS (
                SELECT event_id, event_type AS symbol, ts, value,
                       {lag_cols}
                FROM events
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
            ),
            scored AS (
                SELECT event_id, symbol, ts, value,
                       ({n_terms}) AS nt, ({total}) AS total
                FROM lags
            )
            SELECT event_id, symbol, ts, value,
                   CAST(nt AS BIGINT) AS n_terms,
                   CASE WHEN nt = 0 THEN NULL
                        ELSE total / CAST(256 - (CASE nt {norm_cases} END)
                                          AS DOUBLE) END AS ewma
            FROM scored
        """.format(
            lag_cols=", ".join(
                ["value AS l0"]
                + [f"lag(value, {k}) OVER w AS l{k}" for k in range(1, 8)]
            ),
            n_terms=" + ".join(
                f"(CASE WHEN l{k} IS NOT NULL THEN 1 ELSE 0 END)"
                for k in range(8)
            ),
            total=" + ".join(
                f"coalesce(l{k} * {float(1 << (7 - k))}, 0.0)"
                for k in range(8)
            ),
            norm_cases=" ".join(
                f"WHEN {m} THEN {1 << (8 - m)}" for m in range(1, 9)
            ),
        ),
        "anomaly_flags": """
            WITH cums AS (
                SELECT event_id, event_type AS symbol, ts, value,
                       row_number() OVER o AS rn,
                       sum(CAST(value AS DECIMAL(18,2))) OVER w AS c1,
                       sum(CAST(value AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2))) OVER w AS c2
                FROM events
                WINDOW o AS (PARTITION BY event_type
                             ORDER BY epoch_us(ts), event_id),
                       w AS (PARTITION BY event_type
                             ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ),
            lagged AS (
                SELECT event_id, symbol, ts, value, rn, c1, c2,
                       lag(c1, 200) OVER o2 AS p1,
                       lag(c2, 200) OVER o2 AS p2
                FROM cums
                WINDOW o2 AS (PARTITION BY symbol ORDER BY rn)
            ),
            stats AS (
                SELECT event_id, symbol, ts, value,
                       CAST(least(rn, 200) AS BIGINT) AS roll_n,
                       CAST(c1 - coalesce(p1, 0) AS DOUBLE) AS s1,
                       CAST(c2 - coalesce(p2, 0) AS DOUBLE) AS s2
                FROM lagged
            ),
            scored AS (
                SELECT event_id, symbol, ts, value, roll_n,
                       sqrt(greatest(
                           (s2 - s1 * s1 / CAST(roll_n AS DOUBLE))
                               / CAST(roll_n AS DOUBLE), 0.0)) AS std,
                       round((value - s1 / CAST(roll_n AS DOUBLE))
                             / sqrt(greatest(
                                 (s2 - s1 * s1 / CAST(roll_n AS DOUBLE))
                                     / CAST(roll_n AS DOUBLE), 0.0)), 6) AS z
                FROM stats
            )
            SELECT event_id, symbol, ts, value, roll_n, z
            FROM scored
            WHERE roll_n >= 50 AND std > 0.0 AND abs(z) > 2.0
        """,
        "date_in_counts": f"""
            SELECT event_type AS symbol, ts::date AS trade_date, count(*) AS n_events
            FROM events
            WHERE ts::date = DATE '{DATE_A}' OR ts::date = DATE '{DATE_B}'
            GROUP BY 1, 2
        """,
        "group_quantiles": """
            WITH ranked AS (
                SELECT event_type AS symbol, value AS v,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events WHERE value IS NOT NULL
            )
            SELECT symbol,
                   max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                            THEN v END) AS q50,
                   max(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
                            THEN v END) AS q90,
                   max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                            THEN v END) AS q99
            FROM ranked GROUP BY symbol
        """,
        # banded like the engine (bucket = floor(us/window); a pair
        # shares a bucket or sits in adjacent ones): the former
        # unblocked theta self-join hashed only on event_type, making
        # DuckDB's probe quadratic per type — it spilled 45 GB and
        # timed out at the heaps1 decade.  The a-side probes its own
        # and the NEXT bucket (every unordered pair found exactly
        # once: same-bucket via id order, cross-bucket via bucket
        # order + the id/us filters).
        "event_pairs": """
            WITH e AS (
                SELECT event_type, event_id, epoch_us(ts) AS us,
                       epoch_us(ts) - epoch_us(ts) % 60000000 AS b
                FROM events
            ),
            probes AS (
                SELECT event_type, event_id, us, b AS pb, b AS ob FROM e
                UNION ALL
                SELECT event_type, event_id, us, b + 60000000, b FROM e
            )
            SELECT a.event_type AS symbol, count(*) AS n_pairs
            FROM probes a JOIN e b
              ON a.event_type = b.event_type AND a.pb = b.b
             AND abs(a.us - b.us) <= 60000000
             AND ((a.ob = b.b AND a.event_id < b.event_id)
               OR a.ob < b.b)
            GROUP BY 1
        """,
        "kmv_distinct": _kmv_oracle(),
        "join_cardinality_estimate": _kmv_overlap_oracle(),
        "pagerank_items": _pagerank_oracle(),
        "copurchase_pairs": _basket_pairs_prologue() + """
            SELECT item_a, item_b, support FROM pairs
        """,
        "association_rules": _basket_pairs_prologue() + """,
            isup AS (SELECT item, count(*) AS item_n FROM bounded GROUP BY 1),
            nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM bounded),
            bidir AS (
                SELECT item_a, item_b, support FROM pairs
                UNION ALL
                SELECT item_b, item_a, support FROM pairs
            )
            SELECT p.item_a, p.item_b, p.support,
                   CAST((p.support * 1000000) // sa.item_n AS BIGINT)
                       AS confidence_ppm,
                   CAST((p.support * nb.n_baskets * 1000000)
                        // (sa.item_n * sb.item_n) AS BIGINT) AS lift_ppm
            FROM bidir p
            JOIN isup sa ON sa.item = p.item_a
            JOIN isup sb ON sb.item = p.item_b
            CROSS JOIN nb
        """,
        "event_concentration": """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY 1, 2
            )
            SELECT user_id,
                   CAST(sum(c) AS BIGINT) AS n_events,
                   count(*) AS n_types,
                   CAST((sum(c * c) * 1000000)
                        // (sum(c) * sum(c)) AS BIGINT) AS herfindahl_ppm
            FROM c GROUP BY 1
        """,
        "pit_features": """
            WITH hist AS (
                SELECT user_id, value, ts AS valid_from,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS valid_to
                FROM events WHERE event_type = 'view'
            ),
            facts AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'
            )
            SELECT f.event_id, f.user_id, f.ts,
                   h.value AS feature_value,
                   h.valid_from AS feature_since
            FROM facts f
            LEFT JOIN hist h
              ON f.user_id = h.user_id
             AND h.valid_from <= f.ts
             AND (h.valid_to IS NULL OR f.ts < h.valid_to)
        """,
        "customer_hierarchy": """
            WITH RECURSIVE e AS (
                SELECT c_custkey AS child, c_custkey // 10 AS parent
                FROM customer
            ),
            walk AS (
                SELECT child AS node, parent AS anc,
                       CASE WHEN parent = child THEN 0 ELSE 1 END AS d
                FROM e
                UNION ALL
                SELECT w.node, e.parent, w.d + 1
                FROM walk w
                JOIN e ON w.anc = e.child AND e.parent <> e.child
            )
            SELECT node, arg_max(anc, d) AS root,
                   CAST(max(d) AS BIGINT) AS depth
            FROM walk GROUP BY node
        """,
        "triangle_counts": """
            WITH items AS (
                SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
                FROM lineitem WHERE l_orderkey % 10 = 0
            ),
            bounded AS (
                SELECT basket, item FROM items
                WHERE basket NOT IN (
                    SELECT basket FROM items GROUP BY 1 HAVING count(*) > 32)
            ),
            pairs AS (
                SELECT a.item AS item_a, b.item AS item_b
                FROM bounded a
                JOIN bounded b ON a.basket = b.basket AND a.item < b.item
                GROUP BY 1, 2
                HAVING count(*) >= 1
            ),
            tri AS (
                SELECT p1.item_a AS a, p1.item_b AS b, p2.item_b AS c
                FROM pairs p1
                JOIN pairs p2 ON p1.item_a = p2.item_a
                             AND p1.item_b < p2.item_b
                JOIN pairs p3 ON p3.item_a = p1.item_b
                             AND p3.item_b = p2.item_b
            ),
            nodes AS (SELECT unnest([a, b, c]) AS node FROM tri)
            SELECT node, count(*) AS n_triangles FROM nodes GROUP BY 1
        """,
        "fuzzy_name_pairs": """
            WITH names AS (
                SELECT p_name AS name, count(*) AS n,
                       split_part(p_name, ' ', 1) AS blk
                FROM part GROUP BY 1
            )
            SELECT a.name AS name_a, b.name AS name_b,
                   CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
                   a.n AS n_a, b.n AS n_b
            FROM names a
            JOIN names b ON a.blk = b.blk AND a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 3
        """,
        "range_buckets": """
            WITH binned AS (
                SELECT event_id, value,
                       least(63, greatest(0, CAST(floor(
                           (CAST(value AS DOUBLE) - 0.0) / 7.8125)
                           AS INT))) AS bin
                FROM events
            ),
            counts AS (
                SELECT bin, count(*) AS cnt FROM binned GROUP BY 1
            ),
            cum AS (
                SELECT bin,
                       coalesce(sum(cnt) OVER (ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS before_cnt
                FROM counts
            ),
            m AS (SELECT sum(cnt) AS total FROM counts)
            SELECT b.event_id, b.value, CAST(b.bin AS BIGINT) AS bin,
                   CAST((c.before_cnt * 8) // m.total AS BIGINT) AS bucket
            FROM binned b JOIN cum c ON b.bin = c.bin CROSS JOIN m
        """,
        "zorder_stats": """
            WITH r AS (SELECT min(l_partkey) AS minx, max(l_partkey) AS maxx,
                              min(l_suppkey) AS miny, max(l_suppkey) AS maxy
                       FROM lineitem),
            s AS (SELECT l_partkey AS x, l_suppkey AS y,
                         ((l_partkey - minx) * 256) // (maxx - minx + 1) AS xs,
                         ((l_suppkey - miny) * 256) // (maxy - miny + 1) AS ys
                  FROM lineitem CROSS JOIN r),
            z AS (SELECT x, y, xs, ys, ("""
        + " | ".join(
            f"(((xs >> {i}) & 1) << {2 * i}) | (((ys >> {i}) & 1) << {2 * i + 1})"
            for i in range(8)
        )
        + """) AS zval FROM s)
            SELECT (zval >> 12) AS bucket, count(*) AS n_rows,
                   min(x) AS min_x, max(x) AS max_x,
                   min(y) AS min_y, max(y) AS max_y,
                   max(xs) - min(xs) + 1 AS x_grid_span,
                   max(ys) - min(ys) + 1 AS y_grid_span
            FROM z GROUP BY 1 ORDER BY 1
        """,
        "bloom_dedup_probe": """
            WITH js AS (SELECT unnest(range(4)) AS j),
            seen AS (SELECT coalesce(text, '') AS t FROM documents
                     WHERE doc_id % 2 = 0),
            probe AS (SELECT doc_id, coalesce(text, '') AS t FROM documents
                      WHERE doc_id % 2 = 1),
            spos AS (
                SELECT CAST('0x' || substr(md5('bloom' || j || ':' || t), 1, 15)
                            AS BIGINT) % 65536 AS p
                FROM seen CROSS JOIN js
            ),
            bloom AS (
                SELECT p // 32 AS word,
                       bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
                FROM spos GROUP BY 1
            ),
            ppos AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5('bloom' || j || ':' || t), 1, 15)
                            AS BIGINT) % 65536 AS p
                FROM probe CROSS JOIN js
            ),
            hits AS (
                SELECT pp.doc_id, count(*) AS n_hits
                FROM ppos pp
                JOIN bloom b ON pp.p // 32 = b.word
                WHERE (b.bits & (CAST(1 AS BIGINT) << CAST(pp.p % 32 AS INT)))
                      = (CAST(1 AS BIGINT) << CAST(pp.p % 32 AS INT))
                GROUP BY 1
            )
            SELECT p.doc_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(CASE WHEN coalesce(h.n_hits, 0) = 4 THEN 1 ELSE 0 END
                        AS BIGINT) AS maybe_seen
            FROM probe p LEFT JOIN hits h USING (doc_id)
        """,
        "between_sum": """
            SELECT event_type AS symbol, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                         AND TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY 1
        """,
        "union_extremes": """
            WITH u AS (
                SELECT event_id, event_type, value FROM events WHERE value > 400
                UNION ALL
                SELECT event_id, event_type, value FROM events WHERE value < 1
            )
            SELECT event_type AS symbol, count(*) AS n_extreme FROM u GROUP BY 1
        """,
        "top_events": """
            SELECT symbol, rank, event_id, value FROM (
                SELECT event_type AS symbol,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value DESC, event_id ASC) AS rank,
                       event_id, value
                FROM events
            ) WHERE rank <= 3
        """,
        "revenue_by_nation": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS order_year,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                             * 100 AS HUGEINT) AS BIGINT) AS sum_qty_cents,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                             * 100 AS HUGEINT) AS BIGINT)
                       AS sum_base_price_cents,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                             * 10000 AS HUGEINT) AS BIGINT)
                       AS sum_disc_price_e4,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                            * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
                             * 1000000 AS HUGEINT) AS BIGINT)
                       AS sum_charge_e6,
                   count(*) AS count_order,
                   CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                             * 1000000 AS HUGEINT) // count(*) AS BIGINT)
                       AS avg_qty_micro,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                             * 1000000 AS HUGEINT) // count(*) AS BIGINT)
                       AS avg_price_micro
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2
        """,
        "tpch_q6": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "tpch_q3": """
            SELECT l.l_orderkey, o.o_orderdate,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                       AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
            GROUP BY 1, 2
            ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
            LIMIT 10
        """,
        "big_spenders": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
                FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
            )
            SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, b.total_qty
            FROM orders o
            JOIN big b ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "late_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
        """,
        "promo_share": """
            WITH j AS (
                SELECT p.p_type,
                       CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2))) AS rev
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
                  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            ), s AS (
                SELECT CAST(coalesce(sum(CASE WHEN p_type = 'ECONOMY' THEN rev END), 0) AS DECIMAL(28,4)) AS promo,
                       CAST(sum(rev) AS DECIMAL(28,4)) AS total,
                       CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo_items,
                       count(*) AS n_items
                FROM j
            )
            SELECT n_promo_items, n_items,
                   CAST(promo AS DOUBLE) AS promo_revenue,
                   CAST(total AS DOUBLE) AS total_revenue,
                   (1000000 * CAST(promo * 10000 AS BIGINT)) // CAST(total * 10000 AS BIGINT)
                       AS promo_ppm
            FROM s
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, rank
            FROM (
                SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
                FROM orders)
            WHERE rank <= 3
        """,
        "funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS first_view
                FROM events WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, min(e.ts) AS first_click
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.first_view
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS first_purchase
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.first_click
                GROUP BY e.user_id
            )
            SELECT v.user_id, v.first_view, c.first_click, p.first_purchase
            FROM v
            LEFT JOIN c ON v.user_id = c.user_id
            LEFT JOIN p ON v.user_id = p.user_id
        """,
        "retention_cohorts": """
            WITH firsts AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                FROM events GROUP BY user_id
            )
            SELECT f.cohort_day,
                   CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INTEGER)
                       AS day_offset,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
            FROM events e JOIN firsts f ON e.user_id = f.user_id
            GROUP BY 1, 2
        """,
        "sample_temperature": """
            WITH counts AS (
                SELECT source AS stratum, count(*) AS n FROM documents GROUP BY source
            ), m AS (SELECT min(n) AS n_min FROM counts),
            rates AS (
                SELECT stratum,
                       CAST(floor(1000.0 * (sqrt(CAST(m.n_min AS DOUBLE))
                                            / sqrt(CAST(c.n AS DOUBLE)))) AS BIGINT)
                           AS rate_permille
                FROM counts c, m
            ), bucketed AS (
                SELECT doc_id, source,
                       CAST('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 15)
                            AS BIGINT) % 1000 AS sample_bucket
                FROM documents
            )
            SELECT b.doc_id, b.source, b.sample_bucket, r.rate_permille
            FROM bucketed b JOIN rates r ON b.source = r.stratum
            WHERE b.sample_bucket < r.rate_permille
        """,
        "dedup_incremental": f"""
            WITH {_duck_minhash_cte()},
            batch_ids AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
            corpus_hashes AS (
                SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 7),
            exact_ids AS (
                SELECT doc_id FROM documents
                WHERE doc_id % 10 = 7 AND md5(text) IN (SELECT h FROM corpus_hashes)),
            corpus_bands AS (
                SELECT DISTINCT band_key FROM bands WHERE doc_id % 10 <> 7),
            near_ids AS (
                SELECT DISTINCT doc_id FROM bands
                WHERE doc_id % 10 = 7
                  AND band_key IN (SELECT band_key FROM corpus_bands))
            SELECT b.doc_id,
                   b.doc_id IN (SELECT doc_id FROM exact_ids) AS exact_dup,
                   b.doc_id IN (SELECT doc_id FROM near_ids) AS near_dup,
                   NOT (b.doc_id IN (SELECT doc_id FROM exact_ids)
                        OR b.doc_id IN (SELECT doc_id FROM near_ids)) AS keep
            FROM batch_ids b
        """,
        "corpus_rollup": """
            SELECT coalesce(source, '<all>') AS source,
                   coalesce(lang, '<all>') AS lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY ROLLUP(source, lang)
        """,
        "corpus_cube": """
            SELECT coalesce(lang, '<all>') AS lang,
                   coalesce(source, '<all>') AS source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY CUBE(lang, source)
        """,
        "order_percentiles": """
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cdist,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
        """,
        "coverage_reconcile": """
            WITH a AS (
                SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_even
                FROM events WHERE user_id % 2 = 0
                GROUP BY 1, 2
            ), b AS (
                SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_odd
                FROM events WHERE user_id % 2 = 1 AND value > 450
                GROUP BY 1, 2
            )
            SELECT coalesce(a.event_type, b.event_type) AS event_type,
                   coalesce(a.day, b.day) AS day,
                   coalesce(a.n_even, 0) AS n_even,
                   coalesce(b.n_odd, 0) AS n_odd,
                   (a.n_even IS NOT NULL AND b.n_odd IS NOT NULL) AS in_both
            FROM a FULL OUTER JOIN b
              ON a.event_type = b.event_type AND a.day = b.day
        """,
        "quantile_sketch": """
            WITH binned AS (
                SELECT event_type,
                       least(63, greatest(0,
                           CAST(floor((CAST(value AS DOUBLE) - 0.0) / 8.0) AS INTEGER)))
                           AS bin,
                       count(*) AS cnt
                FROM events GROUP BY 1, 2
            ), cum AS (
                SELECT event_type, bin, cnt,
                       sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
                       CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
                FROM binned
            ), expanded AS (
                SELECT event_type, bin, cnt, cm, n, q
                FROM cum, (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                                          CAST(0.99 AS DOUBLE)]) AS q)
            ), hit AS (
                SELECT *, row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
                FROM expanded
                WHERE CAST(cm AS DOUBLE) >= q * CAST(n AS DOUBLE)
            )
            SELECT event_type, q, n,
                   0.0 + 8.0 * (CAST(bin AS DOUBLE)
                       + (q * CAST(n AS DOUBLE) - CAST(cm - cnt AS DOUBLE))
                         / CAST(cnt AS DOUBLE)) AS est
            FROM hit WHERE rn = 1
        """,
        "supplier_balance_by_region": """
            SELECT r.r_name AS region,
                   count(*) AS n_suppliers,
                   CAST(count(DISTINCT n.n_nationkey) AS BIGINT) AS n_nations,
                   CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
                   min(s.s_acctbal) AS min_balance,
                   max(s.s_acctbal) AS max_balance
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "idle_rich_customers": """
            WITH pos AS (
                SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                       count(*) AS n
                FROM customer WHERE c_acctbal > 0
            ),
            rich AS (
                SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
                FROM customer c, pos
                WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s
            ),
            idle AS (
                SELECT * FROM rich r
                WHERE NOT EXISTS (
                    SELECT 1 FROM orders o
                    WHERE o.o_custkey = r.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
                )
            )
            SELECT c_nationkey AS nationkey, count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       AS totacctbal
            FROM idle GROUP BY 1
        """,
        "table_profile": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS "column", count(*) AS n_rows,
                   count(*) - count({c}) AS n_null,
                   round(CAST(count(*) - count({c}) AS DOUBLE) / count(*), 6)
                       AS null_frac,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM events
            """
            for c in ("event_id", "user_id", "event_type", "value", "props")
        ),
        "nation_trade_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2))
                               - CAST(l.l_discount AS DECIMAL(3,2))))
                        AS DOUBLE) AS volume,
                   count(*) AS n_lines
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY 1, 2, 3
        """,
        "salted_priority_revenue": """
            SELECT o.o_orderpriority,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2))
                               - CAST(l.l_discount AS DECIMAL(3,2))))
                        AS DOUBLE) AS revenue,
                   count(*) AS n_lines
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "ship_lag_distribution": """
            SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 30
                            THEN 'FAST'
                        WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 90
                            THEN 'NORMAL'
                        ELSE 'SLOW' END AS lag_bucket,
                   CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1
        """,
        "order_count_distribution": """
            WITH per_cust AS (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
                GROUP BY 1)
            SELECT c_count, count(*) AS custdist
            FROM per_cust
            GROUP BY 1
        """,
        "top_revenue_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(3,2))
                              - CAST(l_discount AS DECIMAL(3,2)))) AS r
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
            FROM rev
            JOIN supplier s ON rev.l_suppkey = s.s_suppkey
            WHERE rev.r = (SELECT max(r) FROM rev)
        """,
        "small_qty_revenue": """
            WITH pa AS (
                SELECT l_partkey AS pk,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                       count(*) AS n
                FROM lineitem GROUP BY 1)
            SELECT count(*) AS n_lines,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_price
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN pa ON pa.pk = l.l_partkey
            WHERE p.p_brand = 'Brand#3'
              AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * pa.n < pa.sq
        """,
        "value_concentration": """
            WITH pr AS (
                SELECT l_partkey,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(3,2))
                              - CAST(l_discount AS DECIMAL(3,2)))) AS r
                FROM lineitem GROUP BY 1)
            SELECT l_partkey, CAST(r AS DOUBLE) AS part_revenue
            FROM pr
            WHERE r * (SELECT count(*) FROM pr) * 10
                  > (SELECT sum(r) * 14 FROM pr)
        """,
        "supplier_part_variety": """
            SELECT p.p_type, p.p_size,
                   CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_type <> 'PROMO'
              AND l.l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2
        """,
        "min_cost_supplier": """
            WITH el AS (
                SELECT l.l_partkey, l.l_suppkey, s.s_name, l.l_extendedprice
                FROM lineitem l
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                JOIN part p ON l.l_partkey = p.p_partkey
                WHERE r.r_name = 'ASIA' AND p.p_size = 15),
            mn AS (
                SELECT l_partkey AS pk, min(l_extendedprice) AS m
                FROM el GROUP BY 1)
            SELECT DISTINCT el.l_partkey, el.l_suppkey, el.s_name,
                   el.l_extendedprice AS min_price
            FROM el
            JOIN mn ON el.l_partkey = mn.pk AND el.l_extendedprice = mn.m
        """,
        "market_share": """
            WITH j AS (
                SELECT year(o.o_orderdate) AS o_year,
                       CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(3,2))
                          - CAST(l.l_discount AS DECIMAL(3,2))) AS rev,
                       sn.n_name AS supp_nation
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation cn ON c.c_nationkey = cn.n_nationkey
                JOIN region r ON cn.n_regionkey = r.r_regionkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation sn ON s.s_nationkey = sn.n_nationkey
                WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            ), a AS (
                SELECT CAST(o_year AS BIGINT) AS o_year,
                       count(*) AS n_lines,
                       CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_5'
                                              THEN rev END), 0)
                            AS DECIMAL(28,4)) AS num,
                       CAST(sum(rev) AS DECIMAL(28,4)) AS den
                FROM j GROUP BY 1)
            SELECT o_year, n_lines,
                   CAST(num AS DOUBLE) AS nation_revenue,
                   CAST(den AS DOUBLE) AS total_revenue,
                   (1000000 * CAST(num * 10000 AS BIGINT))
                       // CAST(den * 10000 AS BIGINT) AS share_ppm
            FROM a
        """,
        "product_profit": """
            SELECT n.n_name AS nation,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2))
                               - CAST(l.l_discount AS DECIMAL(3,2)))
                            - CAST(p.p_retailprice AS DECIMAL(18,2))
                              * CAST(l.l_quantity AS DECIMAL(18,2))
                              * CAST(0.1 AS DECIMAL(2,1)))
                        AS DOUBLE) AS sum_profit,
                   count(*) AS n_lines
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE p.p_name LIKE '%ring%'
            GROUP BY 1, 2
        """,
        "waiting_suppliers": """
            WITH per_order AS (
                SELECT l.l_orderkey,
                       count(DISTINCT l.l_suppkey) AS n_supp,
                       count(DISTINCT CASE WHEN l.l_shipdate >
                                                o.o_orderdate + INTERVAL 60 DAY
                                           THEN l.l_suppkey END) AS n_late,
                       max(CASE WHEN l.l_shipdate >
                                     o.o_orderdate + INTERVAL 60 DAY
                                THEN l.l_suppkey END) AS late_supp
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderstatus = 'F'
                GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, count(*) AS numwait
            FROM per_order
            JOIN supplier s ON per_order.late_supp = s.s_suppkey
            WHERE n_supp > 1 AND n_late = 1
            GROUP BY 1, 2
        """,
        "promo_heavy_suppliers": """
            WITH heavy AS (
                SELECT DISTINCT l.l_suppkey
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_type = 'PROMO'
                  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                GROUP BY l.l_suppkey, l.l_partkey
                HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 40)
            SELECT s.s_suppkey, s.s_name, n.n_name AS nation
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
        """,
        "returned_revenue": """
            WITH agg AS (
                SELECT c.c_custkey, c.c_name, n.n_name,
                       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                * (CAST(1 AS DECIMAL(3,2))
                                   - CAST(l.l_discount AS DECIMAL(3,2))))
                            AS DOUBLE) AS revenue,
                       count(*) AS n_lines
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
                GROUP BY 1, 2, 3
            )
            SELECT CAST(rank AS BIGINT) AS rank, c_custkey, c_name, n_name,
                   revenue, n_lines
            FROM (
                SELECT *, row_number() OVER (ORDER BY revenue DESC,
                                             c_custkey ASC) AS rank
                FROM agg
            ) WHERE rank <= 20
        """,
        "brand_promo_revenue": """
            SELECT p_brand, count(*) AS n_lines,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2))
                               - CAST(l_discount AS DECIMAL(3,2))))
                        AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
            GROUP BY 1
        """,
        "scd2_history": """
            SELECT event_type, user_id, value, ts AS valid_from,
                   lead(ts) OVER w AS valid_to,
                   lead(ts) OVER w IS NULL AS is_current
            FROM events
            WINDOW w AS (PARTITION BY event_type, user_id
                         ORDER BY ts, event_id)
        """,
        "value_streaks": """
            WITH mv AS (
                SELECT event_type, user_id, ts, event_id, value,
                       lag(value) OVER w AS prev
                FROM events
                WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)
            ), dirs AS (
                SELECT event_type, user_id, ts, event_id,
                       CASE WHEN prev IS NULL THEN NULL
                            WHEN value > prev THEN 'up'
                            WHEN value < prev THEN 'down'
                            ELSE 'flat' END AS direction
                FROM mv
            ), flagged AS (
                SELECT *,
                       CASE WHEN direction IS NULL
                                 OR direction <> coalesce(lag(direction) OVER w2, '')
                            THEN 1 ELSE 0 END AS new_streak
                FROM dirs
                WINDOW w2 AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)
            ), numbered AS (
                SELECT *,
                       sum(new_streak) OVER (
                           PARTITION BY event_type, user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak_id
                FROM flagged
            ), per_streak AS (
                SELECT event_type, user_id, direction, streak_id, count(*) AS len
                FROM numbered
                WHERE direction IS NOT NULL
                GROUP BY 1, 2, 3, 4
            )
            SELECT event_type, direction,
                   count(*) AS n_streaks,
                   max(len) AS max_len,
                   CAST(sum(len) AS BIGINT) AS total_moves
            FROM per_streak
            GROUP BY 1, 2
        """,
        "pack_sequences": r"""
            WITH tok AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS doc_tokens
                FROM documents
            ), placed AS (
                SELECT doc_id, doc_tokens,
                       CAST(coalesce(sum(doc_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                           AS start_offset
                FROM tok
            )
            , exploded AS (
                SELECT doc_id, doc_tokens, start_offset,
                       unnest(generate_series(start_offset // 1024,
                                              (start_offset + doc_tokens - 1) // 1024))
                           AS seq_id
                FROM placed
                WHERE doc_tokens > 0
            )
            SELECT doc_id,
                   CAST(seq_id AS BIGINT) AS seq_id,
                   doc_tokens, start_offset,
                   CAST(least(start_offset + doc_tokens, (seq_id + 1) * 1024)
                        - greatest(start_offset, seq_id * 1024) AS BIGINT) AS tokens_in_seq,
                   CAST(greatest(start_offset, seq_id * 1024) - seq_id * 1024 AS BIGINT)
                       AS offset_in_seq
            FROM exploded
        """,
        "length_batches": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(regexp_split_to_array(coalesce(text, ''),
                            '\\s+')) AS BIGINT) AS n_tokens
                FROM documents
            ),
            r AS (
                SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
                       row_number() OVER (
                           PARTITION BY n_tokens // 64
                           ORDER BY n_tokens, doc_id) - 1 AS pos
                FROM t
            )
            SELECT doc_id, n_tokens, CAST(bucket AS BIGINT) AS bucket,
                   CAST(pos // 8 AS BIGINT) AS batch_idx,
                   CAST(pos % 8 AS BIGINT) AS pos_in_batch
            FROM r
        """,
        "shuffle_order": """
            WITH r AS (
                SELECT doc_id,
                       CAST(row_number() OVER (
                           ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)),
                                    doc_id) - 1 AS BIGINT) AS global_pos
                FROM documents)
            SELECT doc_id, global_pos,
                   CAST(global_pos % 16 AS BIGINT) AS shard
            FROM r
        """,
        "chunk_documents": """
            WITH base AS (
                SELECT doc_id, coalesce(text, '') AS t,
                       CAST(length(coalesce(text, '')) AS BIGINT) AS n
                FROM documents
            )
            , exploded AS (
                SELECT doc_id, t, n,
                       unnest(generate_series(0, n - 1, 224)) AS cs
                FROM base
                WHERE n > 0
            )
            SELECT doc_id,
                   cs // 224 AS chunk_id,
                   cs AS chunk_start,
                   CAST(least(256, n - cs) AS BIGINT) AS chunk_len,
                   md5(substr(t, CAST(cs + 1 AS INTEGER), 256)) AS chunk_md5
            FROM exploded
        """,
        "event_props": """
            SELECT event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        # --- LLM-pipeline oracles -----------------------------------------
        "text_stats": rf"""
            WITH base AS (
                SELECT doc_id, coalesce(text, '') AS text, {_DUCK_TOKS} AS t,
                       length(coalesce(text, '')) AS n_chars
                FROM documents
            ), m AS (
                SELECT doc_id, n_chars,
                       len(t) AS n_tokens,
                       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
                       len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct,
                       len(list_filter(t, x -> x IN {_EN_STOP_SQL})) AS n_stop
                FROM base
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
                   CAST(n_punct AS BIGINT) AS n_punct,
                   round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
                   round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
                   round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
                   round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
                         * (1.0 - round(CAST(n_punct AS DOUBLE) / n_chars, 6))
                         * (0.5 + round(CAST(n_stop AS DOUBLE) / n_tokens, 6)), 6) AS quality_score
            FROM m
        """,
        "lang_id": rf"""
            WITH m AS (
                SELECT doc_id, {_DUCK_TOKS} AS t,
                       len(list_filter({_DUCK_TOKS}, x -> x IN {_EN_STOP_SQL})) AS hits_en,
                       len(list_filter({_DUCK_TOKS}, x -> x IN ('der','die','das','und','ist','ein','nicht','mit'))) AS hits_de,
                       len(list_filter({_DUCK_TOKS}, x -> x IN ('el','la','de','y','es','que','un','por'))) AS hits_es,
                       len(list_filter({_DUCK_TOKS}, x -> x IN ('le','la','et','est','un','que','pour','dans'))) AS hits_fr
                FROM documents
            )
            SELECT doc_id,
                   CAST(hits_en AS BIGINT) AS hits_en,
                   CAST(hits_de AS BIGINT) AS hits_de,
                   CAST(hits_es AS BIGINT) AS hits_es,
                   CAST(hits_fr AS BIGINT) AS hits_fr,
                   CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
                        WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
                        WHEN hits_es >= hits_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred,
                   round(CAST(greatest(hits_en, hits_de, hits_es, hits_fr) AS DOUBLE)
                         / greatest(len(t), 1), 6) AS lang_confidence
            FROM m
        """,
        "fingerprint": r"""
            WITH n AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                           '\s+', ' ', 'g')) AS norm
                FROM documents
            )
            SELECT doc_id, md5(norm) AS fingerprint_md5,
                   CAST('0x' || substr(md5(norm), 1, 15) AS BIGINT) AS fingerprint_h64
            FROM n
        """,
        "dedup_exact": """
            WITH recrawl AS (
                SELECT doc_id + 10000000000 AS doc_id, text
                FROM documents
                WHERE CAST('0x' || substr(md5('recrawl:' || text), 1, 2) AS INT) % 16 = 0
            ),
            corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id, text FROM recrawl
            )
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM corpus GROUP BY 1 HAVING count(*) > 1
        """,
        "quality_flags": _QUALITY_FLAGS_SQL,
        "repetition_stats": _REPETITION_STATS_SQL,
        "domain_caps": _DOMAIN_CAPS_SQL,
        "budget_sample": _BUDGET_SAMPLE_SQL,
        "heavy_hitters": _HEAVY_HITTERS_SQL,
        "corpus_report": f"""
            WITH q AS ({_QUALITY_FLAGS_SQL})
            SELECT d.source, d.lang, count(*) AS n_docs,
                   CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
                   round(CAST(sum(CAST(q.mean_token_len AS DECIMAL(28,6))) AS DOUBLE)
                         / count(*), 6) AS avg_token_len,
                   round(CAST(sum(CASE WHEN q.passes_quality THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS pass_rate
            FROM documents d JOIN q ON q.doc_id = d.doc_id
            GROUP BY 1, 2
        """,
        "split_by_domain": """
            SELECT doc_id, source,
                   CASE WHEN CAST('0x' || substr(md5('domsplit:' || source), 1, 15)
                             AS BIGINT) % 100 < 90 THEN 'train'
                        WHEN CAST('0x' || substr(md5('domsplit:' || source), 1, 15)
                             AS BIGINT) % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "split_assign": """
            SELECT doc_id,
                   CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) % 100 AS bucket,
                   CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 100 < 90 THEN 'train'
                        WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "sample_stratified": """
            WITH bucketed AS (
                SELECT doc_id, text, lang, source, n_chars,
                       CAST('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15)
                            AS BIGINT) % 1000 AS sample_bucket
                FROM documents
            )
            SELECT * FROM bucketed
            WHERE sample_bucket < CASE lang
                WHEN 'de' THEN 1000 WHEN 'en' THEN 300 WHEN 'es' THEN 1000
                WHEN 'fr' THEN 1000 WHEN 'zh' THEN 500 ELSE 0 END
        """,
        # winnow_fingerprints mirrors text.py::winnow_fingerprints:
        # char-5-gram md5 hashes, window of 8, min with rightmost-tie
        # (indicator argmax — symmetric in both engines), selections
        # deduped within doc.  DuckDB list slice l[a:b] is 1-based
        # inclusive and clamps at the list end, matching Spark's
        # slice(hs, j, 8); selections are '|'-packed strings because
        # list_distinct over structs is not portable.
        "winnow_fingerprints": r"""
            WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
            hs AS (
                SELECT doc_id,
                       greatest(length(t) - 4, 0) AS n_g,
                       list_transform(range(1, greatest(length(t) - 4, 0) + 1),
                                      i -> CAST('0x' || substr(md5(substr(t, i, 5)), 1, 15)
                                               AS BIGINT)) AS hs
                FROM d
            ),
            sel AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, greatest(n_g - 7, 1) + 1),
                         j -> CAST(j - 1 + list_max(list_transform(range(1, len(hs[j:j+7]) + 1),
                                  i -> CASE WHEN hs[j:j+7][i] = list_min(hs[j:j+7])
                                       THEN i ELSE 0 END)) AS VARCHAR)
                              || '|' || CAST(list_min(hs[j:j+7]) AS VARCHAR))) AS sels
                FROM hs WHERE n_g >= 1
            )
            SELECT doc_id,
                   CAST(string_split(s, '|')[1] AS BIGINT) AS pos,
                   CAST(string_split(s, '|')[2] AS BIGINT) AS fp
            FROM (SELECT doc_id, unnest(sels) AS s FROM sel)
        """,
        # winnow_overlap_pairs: same winnow selection as above but
        # position-free (window minima only), then the df-capped
        # posting self-join; the cap replays the engine's integer
        # formula max(16, min(64, 10*N div 1000)) with a scalar
        # subquery (the absolute ceiling is MOSS's ignore-threshold —
        # the round-7 Heaps audit showed a cap ∝ N goes quadratic).
        "winnow_overlap_pairs": r"""
            WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
            hs AS (
                SELECT doc_id,
                       greatest(length(t) - 4, 0) AS n_g,
                       list_transform(range(1, greatest(length(t) - 4, 0) + 1),
                                      i -> CAST('0x' || substr(md5(substr(t, i, 5)), 1, 15)
                                               AS BIGINT)) AS hs
                FROM d
            ),
            sel AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, greatest(n_g - 7, 1) + 1),
                                                    j -> list_min(hs[j:j+7]))) AS fps
                FROM hs WHERE n_g >= 1
            ),
            posting AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
            capped AS (
                SELECT doc_id, fp FROM (
                    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
                    FROM posting
                )
                WHERE df >= 2
                  AND df <= greatest(16, least(64,
                        (10 * (SELECT count(*) FROM documents)) // 1000))
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM capped a JOIN capped b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 3
        """,
        # winnow_probe: same winnow selection, batch (id%10==7) x
        # corpus cross join; df cap on the CORPUS side with N = corpus
        # row count (scalar subquery replays the integer formula).
        "winnow_probe": r"""
            WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
            hs AS (
                SELECT doc_id,
                       greatest(length(t) - 4, 0) AS n_g,
                       list_transform(range(1, greatest(length(t) - 4, 0) + 1),
                                      i -> CAST('0x' || substr(md5(substr(t, i, 5)), 1, 15)
                                               AS BIGINT)) AS hs
                FROM d
            ),
            sel AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, greatest(n_g - 7, 1) + 1),
                                                    j -> list_min(hs[j:j+7]))) AS fps
                FROM hs WHERE n_g >= 1
            ),
            posting AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
            capped AS (
                SELECT doc_id, fp FROM (
                    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
                    FROM posting WHERE doc_id % 10 <> 7
                )
                WHERE df <= greatest(16, least(64,
                        (10 * (SELECT count(*) FROM documents
                               WHERE doc_id % 10 <> 7)) // 1000))
            )
            SELECT b.doc_id AS batch_doc, c.doc_id AS corpus_doc,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM (SELECT doc_id, fp FROM posting WHERE doc_id % 10 = 7) b
            JOIN capped c ON b.fp = c.fp
            GROUP BY 1, 2
            HAVING count(*) >= 3
        """,
        # dsir_topk mirrors functions/text.py::dsir_weights exactly:
        # hashed word-bigram buckets, add-one-smoothed integer ratio,
        # floor-log2 via length(bin(x)) - 1 (exact in both engines),
        # int64 per-doc sums, total-order top-100.
        "dsir_topk": r"""
            WITH toks AS (
                SELECT doc_id, source,
                       regexp_split_to_array(coalesce(text, ''), '\s+') AS t
                FROM documents
            ),
            g AS (
                SELECT doc_id, source,
                       unnest(CASE WHEN len(t) >= 2
                              THEN list_transform(range(0, len(t)-1),
                                                  i -> t[i+1] || ' ' || t[i+2])
                              ELSE [array_to_string(t, ' ')] END) AS g
                FROM toks
            ),
            occ AS (
                SELECT doc_id, source,
                       CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS b
                FROM g
            ),
            dbc AS (
                SELECT doc_id, source, b, count(*) AS c
                FROM occ GROUP BY 1, 2, 3
            ),
            raw AS (SELECT b, SUM(c) AS r FROM dbc GROUP BY 1),
            tgt AS (SELECT b, SUM(c) AS t FROM dbc
                    WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
            score AS (
                SELECT raw.b,
                       CAST(length(bin(greatest(
                           (1048576 * (coalesce(tgt.t, 0) + 1)) // (raw.r + 1),
                           1))) - 21 AS BIGINT) AS s
                FROM raw LEFT JOIN tgt ON raw.b = tgt.b
            )
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_feats,
                   CAST(SUM(c * s) AS BIGINT) AS logw_q
            FROM dbc JOIN score ON dbc.b = score.b
            GROUP BY doc_id
            ORDER BY logw_q DESC, doc_id
            LIMIT 100
        """,
        "bpe_pair_counts": r"""
            WITH words AS (
                SELECT unnest(regexp_split_to_array(
                           lower(coalesce(text, '')), '\s+')) AS w
                FROM documents
            ),
            w2 AS (SELECT w FROM words WHERE len(w) >= 2),
            pairs AS (
                SELECT unnest(list_transform(range(1, len(w)),
                                             i -> substr(w, i, 2))) AS pair
                FROM w2
            ),
            counts AS (
                SELECT pair, count(*) AS n_occurrences FROM pairs GROUP BY 1
            )
            SELECT rank, pair, n_occurrences FROM (
                SELECT CAST(row_number() OVER (
                           ORDER BY n_occurrences DESC, pair) AS BIGINT) AS rank,
                       pair, n_occurrences
                FROM counts)
            WHERE rank <= 50
        """,
        "lm_coverage": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(coalesce(text, ''), '\s+') AS l
                FROM documents
            ), gram_arrays AS (
                SELECT doc_id,
                       CASE WHEN len(l) >= 2
                            THEN list_transform(range(1, len(l)),
                                                i -> l[i] || ' ' || l[i+1])
                            ELSE [array_to_string(l, ' ')] END AS grams
                FROM toks
            ), grams AS (
                SELECT doc_id, unnest(grams) AS gram FROM gram_arrays
            ), known AS (
                SELECT gram FROM grams GROUP BY 1 HAVING count(*) >= 3
            ), per_doc AS (
                SELECT doc_id,
                       count(*) AS n_bigrams,
                       CAST(sum(CASE WHEN gram IN (SELECT gram FROM known)
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_known_bigrams
                FROM grams GROUP BY 1)
            SELECT doc_id, n_bigrams, n_known_bigrams,
                   (1000000 * n_known_bigrams) // n_bigrams AS coverage_ppm
            FROM per_doc
        """,
        "vocab_topk": r"""
            WITH tok AS (
                SELECT doc_id, unnest(regexp_split_to_array(coalesce(text, ''), '\s+')) AS token
                FROM documents
            ),
            counts AS (
                SELECT token, count(*) AS n_occurrences,
                       count(DISTINCT doc_id) AS n_docs
                FROM tok GROUP BY 1
            )
            SELECT CAST(rank AS BIGINT) AS rank, token, n_occurrences, n_docs FROM (
                SELECT token, n_occurrences, n_docs,
                       row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS rank
                FROM counts
            ) WHERE rank <= 100
        """,
        # phrase_search: the phrase is the corpus's modal bigram
        # (count desc, bigram asc — same derivation as the engine),
        # then positional overlapping-occurrence counting
        "phrase_search": r"""
            WITH d AS (
                SELECT doc_id,
                       regexp_split_to_array(coalesce(text, ''), '\s+') AS arr
                FROM documents
            ),
            bg AS (
                SELECT arr[i] || ' ' || arr[i + 1] AS bigram
                FROM d, unnest(range(1, len(arr))) t(i)
                WHERE len(arr) >= 2
                  AND arr[i] <> '' AND arr[i + 1] <> ''
            ),
            top AS (
                SELECT bigram, string_split(bigram, ' ')[1] AS w1,
                       string_split(bigram, ' ')[2] AS w2
                FROM bg GROUP BY 1
                ORDER BY count(*) DESC, bigram LIMIT 1
            )
            SELECT doc_id, n_occurrences FROM (
                SELECT d.doc_id,
                       CAST(len(list_filter(range(1, len(d.arr)),
                            i -> d.arr[i] = t.w1
                             AND d.arr[i + 1] = t.w2))
                            AS BIGINT) AS n_occurrences
                FROM d, top t
            ) WHERE n_occurrences > 0
        """,
        "bm25_topk": _bm25_oracle(),
        "hybrid_topk": f"""
            WITH bm AS (
                SELECT doc_id, rank AS bm25_rank
                FROM ({_bm25_oracle(50)})
            ),
            nn AS (
                SELECT neighbor_id AS doc_id, rank AS vec_rank
                FROM ({_knn_bruteforce_oracle(50)})
                WHERE query_id = {_HYBRID_QUERY_ID}
            ),
            fused AS (
                SELECT coalesce(bm.doc_id, nn.doc_id) AS doc_id,
                       CAST(coalesce(bm25_rank, 0) AS BIGINT) AS bm25_rank,
                       CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank,
                       CAST((CASE WHEN coalesce(bm25_rank, 0) > 0
                                  THEN 1000000000000 // (60 + bm25_rank)
                                  ELSE 0 END)
                          + (CASE WHEN coalesce(vec_rank, 0) > 0
                                  THEN 1000000000000 // (60 + vec_rank)
                                  ELSE 0 END) AS BIGINT) AS rrf_score
                FROM bm FULL OUTER JOIN nn ON bm.doc_id = nn.doc_id
            )
            SELECT * FROM (
                SELECT doc_id, bm25_rank, vec_rank, rrf_score,
                       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                            AS BIGINT) AS rank
                FROM fused
            ) WHERE rank <= 10
        """,
        "tfidf_cosine_pairs": """
            WITH tok AS (
                SELECT doc_id, arr, len(arr) AS L FROM (
                    SELECT doc_id,
                           regexp_split_to_array(coalesce(text, ''), '\\s+') AS arr
                    FROM documents)
            ),
            grams AS (
                SELECT doc_id, unnest(CASE WHEN L >= 3
                    THEN list_transform(range(1, L - 1),
                         i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])
                    ELSE [array_to_string(arr, ' ')] END) AS term
                FROM tok
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM grams GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
                    HAVING count(*) <= 20),
            nn AS (SELECT count(*) AS n FROM documents),
            w AS (
                SELECT doc_id, term, CAST(tf * ((1000 * n) // df) AS HUGEINT) AS w
                FROM tf JOIN dfq USING (term) CROSS JOIN nn
            ),
            norms AS (SELECT doc_id, sum(w * w) AS sq FROM w GROUP BY 1),
            dots AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
                FROM w a JOIN w b USING (term)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(dot::DOUBLE / sqrt(na.sq::DOUBLE * nb.sq::DOUBLE), 6)
                       AS sim
            FROM dots
            JOIN norms na ON na.doc_id = id_a
            JOIN norms nb ON nb.doc_id = id_b
            WHERE round(dot::DOUBLE / sqrt(na.sq::DOUBLE * nb.sq::DOUBLE), 6)
                  >= 0.1
        """,
        "tfidf_topterms": r"""
            WITH tok AS (
                SELECT doc_id, unnest(regexp_split_to_array(coalesce(text, ''), '\s+')) AS term
                FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                       round(CAST(tf.tf AS DOUBLE)
                             * (CAST((SELECT count(*) FROM documents) + 1 AS DOUBLE)
                                / CAST(dfq.df + 1 AS DOUBLE)), 6) AS score
                FROM tf JOIN dfq USING (term)
            )
            SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank FROM (
                SELECT doc_id, term, tf, df, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term ASC) AS rank
                FROM scored
            ) WHERE rank <= 3
        """,
        "pii_scan": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''), 'https?://[^\s]+')) AS BIGINT) AS n_urls,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phones,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(coalesce(text, ''), 'https?://[^\s]+', '<URL>', 'g'),
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                     '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS redacted
            FROM documents
        """,
        "neardup_clusters": _duck_neardup_cluster_sql(),
        "canonical_docs": f"""
            WITH clusters AS (
                SELECT * FROM ({_duck_neardup_cluster_sql()})
            ),
            q AS (
                SELECT doc_id,
                       round(least(CAST(len(t) AS DOUBLE) / 50.0, 1.0)
                             * (1.0 - round(CAST(len(regexp_extract_all(
                                   coalesce(text, ''), '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                                   / length(coalesce(text, '')), 6))
                             * (0.5 + round(CAST(len(list_filter(t,
                                   x -> x IN ('the','a','of','and','to',
                                              'is','in','that')))
                                   AS DOUBLE) / len(t), 6)), 6)
                           AS quality_score
                FROM (SELECT doc_id, coalesce(text, '') AS text,
                             regexp_split_to_array(coalesce(text, ''), '\\s+') AS t
                      FROM documents)
            ),
            ranked AS (
                SELECT c.doc_id, c.cluster_id, q.quality_score,
                       row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY q.quality_score DESC, c.doc_id) AS rk,
                       count(*) OVER (PARTITION BY c.cluster_id) AS csz
                FROM clusters c JOIN q USING (doc_id)
            )
            SELECT doc_id, cluster_id, quality_score,
                   CAST(csz AS BIGINT) AS cluster_size,
                   rk = 1 AS is_canonical
            FROM ranked
        """,
        "dedup_corpus": """
            SELECT d.* FROM documents d
            JOIN (SELECT md5(text) AS h, min(doc_id) AS keep
                  FROM documents GROUP BY 1) k
              ON md5(d.text) = k.h AND d.doc_id = k.keep
        """,
        "span_dedup": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
            pos AS (
                SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS pos
                FROM toks
            ),
            occ AS (
                SELECT doc_id, pos,
                       array_to_string(t[(pos*10+1):(pos*10+10)], ' ') AS chunk
                FROM pos
            ),
            occf AS (SELECT * FROM occ WHERE trim(chunk) <> ''),
            dft AS (SELECT chunk, count(DISTINCT doc_id) AS df
                    FROM occf GROUP BY 1),
            kept AS (
                SELECT o.doc_id, count(*) AS n_kept,
                       string_agg(o.chunk, ' ' ORDER BY o.pos) AS clean_text
                FROM occf o JOIN dft USING (chunk)
                WHERE df <= 1 GROUP BY 1
            ),
            per_doc AS (SELECT doc_id, count(*) AS n_chunks
                        FROM occf GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(p.n_chunks, 0) AS n_chunks,
                   coalesce(p.n_chunks, 0) - coalesce(k.n_kept, 0) AS n_dropped,
                   coalesce(k.clean_text, '') AS clean_text
            FROM documents d
            LEFT JOIN per_doc p USING (doc_id)
            LEFT JOIN kept k USING (doc_id)
        """,
        "decontaminate": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
            g AS (
                SELECT doc_id,
                       list_distinct(CASE WHEN len(t) >= 5 THEN
                           list_transform(range(0, len(t)-4),
                               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                                    || ' ' || t[i+4] || ' ' || t[i+5])
                       ELSE [array_to_string(t, ' ')] END) AS gs
                FROM toks
            ),
            ev AS (SELECT DISTINCT unnest(gs) AS gm FROM g
                   WHERE doc_id % 97 = 0),
            tp AS (SELECT doc_id, unnest(gs) AS gm FROM g
                   WHERE doc_id % 97 <> 0),
            sh AS (SELECT tp.doc_id, count(*) AS n_shared
                   FROM tp JOIN ev USING (gm) GROUP BY 1),
            tot AS (SELECT doc_id, len(gs) AS n_grams FROM g
                    WHERE doc_id % 97 <> 0)
            SELECT tot.doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                   coalesce(n_shared, 0) AS n_shared,
                   (1000000 * coalesce(n_shared, 0)) // n_grams AS contamination_ppm,
                   ((1000000 * coalesce(n_shared, 0)) // n_grams) >= 500000
                       AS contaminated
            FROM tot LEFT JOIN sh USING (doc_id)
        """,
        "dedup_minhash_lsh": f"""
            WITH {_duck_minhash_cte()},
            cands AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.sh AS sh_a, b.sh AS sh_b
                FROM bands a JOIN bands b USING (band_key)
                WHERE a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, jaccard FROM (
                SELECT id_a, id_b,
                       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
                FROM cands
            ) WHERE jaccard >= 0.01
        """,
        # mirrors the engine structurally: posting table df-capped at
        # 1000 (the quadratic-hot-key guard), intersection = collision
        # count on the capped posting, denominators from full set sizes
        "ngram_jaccard": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
            shing AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM toks),
            posting AS (SELECT doc_id, unnest(sh) AS gram FROM shing),
            rare AS (
                SELECT gram FROM (SELECT gram, count(*) AS c FROM posting GROUP BY 1)
                WHERE c <= 1000
            ),
            capped AS (SELECT p.doc_id, p.gram FROM posting p JOIN rare USING (gram)),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM capped a JOIN capped b USING (gram)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, len(sh) AS sz FROM shing)
            SELECT id_a, id_b, jaccard FROM (
                SELECT id_a, id_b,
                       round(CAST(n_inter AS DOUBLE)
                             / (sa.sz + sb.sz - n_inter), 6) AS jaccard
                FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
            ) WHERE jaccard >= 0.01
        """,
        "simhash_docs": f"""
            WITH {_duck_simhash_cte()}
            SELECT doc_id, simhash, n_distinct_tokens FROM sigs
        """,
        # pigeonhole-replay oracle (exact: hamming<=3 with 4 chunks
        # forces >=1 equal chunk).  The brute-force cross-validation of
        # the chunk-join trick lives in pytest
        # (test_simhash_pairs_match_bruteforce) where the corpus is
        # small; as an oracle the O(n^2) form was infeasible at heaps2.
        "simhash_pairs": f"""
            WITH {_duck_simhash_cte()}{_duck_simhash_pairs_cte()}
            SELECT id_a, id_b, hamming FROM p
        """,
        "knn_bruteforce": _knn_bruteforce_oracle(),
        "sq8_topk": _sq8_oracle(),
        "hard_negatives": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS q_vec, label AS q_lab
                FROM embeddings WHERE vec_id IN ({_KNN_IDS_SQL})
            ),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       {_DUCK_COSINE.format(a="q.q_vec", b="e.embedding")} AS sim
                FROM q, embeddings e
                WHERE e.vec_id <> q.query_id AND e.label <> q.q_lab
            )
            SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
                SELECT query_id, neighbor_id, sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id ASC)
                           AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "knn_confusion": f"""
            WITH nn AS (SELECT * FROM ({_knn_bruteforce_oracle()})),
            votes AS (
                SELECT nn.query_id, e.label, count(*) AS n_votes
                FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id
                GROUP BY 1, 2
            ),
            pred AS (
                SELECT query_id, label AS pred_label
                FROM (
                    SELECT query_id, label, n_votes,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, label ASC) AS rk
                    FROM votes
                ) WHERE rk = 1
            )
            SELECT t.label AS true_label, p.pred_label,
                   count(*) AS n_queries
            FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
            GROUP BY 1, 2
        """,
        "knn_label_eval": f"""
            WITH nn AS (SELECT * FROM ({_knn_bruteforce_oracle()})),
            votes AS (
                SELECT nn.query_id, e.label, count(*) AS n_votes
                FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id
                GROUP BY 1, 2
            ),
            pred AS (
                SELECT query_id, label AS pred_label,
                       CAST(n_votes AS BIGINT) AS n_votes
                FROM (
                    SELECT query_id, label, n_votes,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, label ASC) AS rk
                    FROM votes
                ) WHERE rk = 1
            )
            SELECT p.query_id, t.label AS true_label, p.pred_label,
                   p.n_votes, p.pred_label = t.label AS correct
            FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
        """,
        "ann_recall_report": _ann_recall_oracle(),
        "embedding_quantize": """
            WITH elems AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS val
                FROM embeddings
            ), stats AS (
                SELECT pos,
                       CAST(min(CAST(val AS DOUBLE)) AS DOUBLE) AS mn,
                       CAST(max(CAST(val AS DOUBLE)) AS DOUBLE) AS mx
                FROM elems GROUP BY 1
            ), codes AS (
                SELECT e.vec_id, e.pos,
                       CASE WHEN s.mx = s.mn THEN 0
                            ELSE least(greatest(CAST(floor(
                                     ((CAST(e.val AS DOUBLE) - s.mn) * 255)
                                     / (s.mx - s.mn)) AS BIGINT),
                                 0), 255) END AS code
                FROM elems e JOIN stats s ON e.pos = s.pos
            )
            SELECT vec_id,
                   count(*) AS n_dims,
                   CAST(sum(code) AS BIGINT) AS code_sum,
                   CAST(max(CASE WHEN pos = 1 THEN code END) AS BIGINT)
                       AS code_first,
                   CAST(max(CASE WHEN pos = (SELECT max(pos) FROM stats)
                                 THEN code END) AS BIGINT) AS code_last
            FROM codes
            GROUP BY 1
        """,
        "embedding_neardup": f"""
            SELECT id_a, id_b, sim FROM (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       {_DUCK_COSINE.format(a="a.embedding", b="b.embedding")} AS sim
                FROM embeddings a JOIN embeddings b ON a.label = b.label
                WHERE a.vec_id < b.vec_id
            ) WHERE sim >= 0.3
        """,
        "embedding_clusters": f"""
            WITH RECURSIVE p AS (
                SELECT id_a, id_b FROM (
                    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                           {_DUCK_COSINE.format(a="a.embedding", b="b.embedding")} AS sim
                    FROM embeddings a JOIN embeddings b ON a.label = b.label
                    WHERE a.vec_id < b.vec_id
                ) WHERE sim >= 0.3
            ),
            e AS (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION
                SELECT id_b, id_a FROM p
            ),
            reach(src, node) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT r.src, e.dst FROM reach r JOIN e ON r.node = e.src
            )
            SELECT src AS vec_id, min(node) AS cluster_id
            FROM reach GROUP BY 1
        """,
        # deterministic ANN/media oracles: replay the engine's exact
        # candidate construction (bucket keys / cell assignment / fake
        # bytes) from the same literals, then re-rank/score in SQL
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "ivfpq_topk": _ivfpq_oracle(),
        "pq_recall_report": _pq_recall_oracle(),
        "bpe_fertility": rf"""
            WITH base AS (
                SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents
            ), w AS (
                SELECT doc_id,
                       unnest(list_filter(t, x -> regexp_matches(x, '^[a-z]+$'))) AS word
                FROM base
            ), {_duck_bpe_wp_cte()}, pieces AS (
                SELECT doc_id, length(word) AS wchars, p
                FROM w JOIN wp USING (word)
            ), per_doc AS (
                SELECT doc_id, CAST(sum(p) AS BIGINT) AS alpha_pieces,
                       CAST(sum(wchars) AS BIGINT) AS alpha_chars,
                       CAST(count(*) AS BIGINT) AS n_words
                FROM pieces GROUP BY 1
            ), agg AS (
                SELECT b.lang,
                       count(*) AS n_docs,
                       CAST(sum(coalesce(p.n_words, 0)) AS BIGINT) AS n_alpha_words,
                       CAST(sum(coalesce(p.alpha_pieces, 0)) AS BIGINT) AS n_bpe_pieces,
                       CAST(sum(coalesce(p.alpha_chars, 0)) AS BIGINT) AS alpha_chars
                FROM base b LEFT JOIN per_doc p USING (doc_id)
                GROUP BY 1
            )
            SELECT lang, n_docs, n_alpha_words, n_bpe_pieces, alpha_chars,
                   CAST((1000 * n_bpe_pieces) // greatest(n_alpha_words, 1)
                        AS BIGINT) AS fertility_permille,
                   CAST((1000 * alpha_chars) // greatest(n_bpe_pieces, 1)
                        AS BIGINT) AS compression_permille
            FROM agg
        """,
        "curriculum_order": rf"""
            WITH posting AS (
                SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
            ),
            vocab AS (SELECT tok, count(*) AS c FROM posting GROUP BY 1),
            tot AS (SELECT sum(c) AS n_total FROM vocab),
            scored AS (
                SELECT tok,
                       CAST(length(bin(CAST(n_total AS BIGINT) // c)) - 1
                            AS BIGINT) AS bits
                FROM vocab, tot
            ),
            per_doc AS (
                SELECT p.doc_id, count(p.tok) AS n_tokens,
                       CAST(coalesce(sum(s.bits), 0) AS BIGINT) AS total_bits
                FROM posting p LEFT JOIN scored s USING (tok)
                GROUP BY 1
            ),
            diff AS (
                SELECT d.doc_id,
                       CAST((1000 * coalesce(total_bits, 0))
                            // greatest(coalesce(n_tokens, 0), 1) AS BIGINT)
                           AS difficulty_millibits
                FROM (SELECT doc_id FROM documents) d LEFT JOIN per_doc USING (doc_id)
            ),
            ranked AS (
                SELECT doc_id, difficulty_millibits,
                       CAST(row_number() OVER (
                           ORDER BY difficulty_millibits, doc_id) - 1
                           AS BIGINT) AS global_pos,
                       count(*) OVER () AS n_docs
                FROM diff
            )
            SELECT doc_id, difficulty_millibits, global_pos,
                   CAST((4 * global_pos) // n_docs AS BIGINT) AS stage
            FROM ranked
        """,
        "token_surprisal": rf"""
            WITH posting AS (
                SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
            ),
            vocab AS (
                SELECT tok, count(*) AS c FROM posting GROUP BY 1
            ),
            tot AS (SELECT sum(c) AS n_total FROM vocab),
            scored AS (
                SELECT tok,
                       CAST(length(bin(CAST(n_total AS BIGINT) // c)) - 1
                            AS BIGINT) AS bits
                FROM vocab, tot
            ),
            per_doc AS (
                SELECT p.doc_id,
                       count(p.tok) AS n_tokens,
                       CAST(coalesce(sum(s.bits), 0) AS BIGINT) AS total_bits
                FROM posting p LEFT JOIN scored s USING (tok)
                GROUP BY 1
            ),
            all_docs AS (SELECT doc_id FROM documents)
            SELECT d.doc_id,
                   CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(total_bits, 0) AS BIGINT) AS total_bits,
                   CAST((1000 * coalesce(total_bits, 0))
                        // greatest(coalesce(n_tokens, 0), 1) AS BIGINT)
                       AS avg_millibits
            FROM all_docs d LEFT JOIN per_doc USING (doc_id)
        """,
        "bpe_encode": rf"""
            WITH base AS (
                SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
            ), per_doc AS (
                SELECT doc_id,
                       CAST(len(t) AS BIGINT) AS n_tokens,
                       CAST(len(list_filter(t, x -> regexp_matches(x, '^[a-z]+$')))
                            AS BIGINT) AS n_alpha_words
                FROM base
            ), w AS (
                SELECT doc_id,
                       unnest(list_filter(t, x -> regexp_matches(x, '^[a-z]+$'))) AS word
                FROM base
            ), {_duck_bpe_wp_cte()}, pieces AS (
                SELECT doc_id, length(word) AS wchars, p
                FROM w JOIN wp USING (word)
            ), agg AS (
                SELECT doc_id, CAST(sum(p) AS BIGINT) AS alpha_pieces,
                       CAST(sum(wchars) AS BIGINT) AS alpha_chars
                FROM pieces GROUP BY 1
            )
            SELECT d.doc_id, d.n_tokens, d.n_alpha_words,
                   CAST(coalesce(a.alpha_pieces, 0) + d.n_tokens - d.n_alpha_words
                        AS BIGINT) AS n_bpe_pieces,
                   CAST(coalesce(a.alpha_chars, 0) AS BIGINT) AS alpha_chars,
                   CAST((1000 * coalesce(a.alpha_chars, 0))
                        // greatest(coalesce(a.alpha_pieces, 0), 1) AS BIGINT)
                       AS compression_permille
            FROM per_doc d LEFT JOIN agg a USING (doc_id)
        """,
        "quality_classify": rf"""
            WITH base AS (
                SELECT doc_id, coalesce(text, '') AS text, {_DUCK_TOKS} AS t,
                       length(coalesce(text, '')) AS nc
                FROM documents
            ), m AS (
                SELECT doc_id,
                       least(len(t), 500) AS cap_tokens,
                       (1000000 * len(list_filter(t, x -> x IN {_EN_STOP_SQL})))
                           // greatest(len(t), 1) AS stop_ppm,
                       (1000000 * len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')))
                           // greatest(nc, 1) AS punct_ppm,
                       (1000000 * len(regexp_extract_all(text, '[0-9]')))
                           // greatest(nc, 1) AS digit_ppm,
                       (1000 * nc) // greatest(len(t), 1) AS len_milli
                FROM base
            )
            SELECT doc_id,
                   CAST(cap_tokens AS BIGINT) AS cap_tokens,
                   CAST(stop_ppm AS BIGINT) AS stop_ppm,
                   CAST(punct_ppm AS BIGINT) AS punct_ppm,
                   CAST(digit_ppm AS BIGINT) AS digit_ppm,
                   CAST(len_milli AS BIGINT) AS len_milli,
                   CAST(-400000 + 800 * cap_tokens
                        + 3 * stop_ppm + (-2) * punct_ppm
                        + (-3) * digit_ppm + (-20) * len_milli
                        AS BIGINT) AS logit_micro,
                   (-400000 + 800 * cap_tokens
                    + 3 * stop_ppm + (-2) * punct_ppm
                    + (-3) * digit_ppm + (-20) * len_milli) >= 0 AS keep
            FROM m
        """,
        "embedding_drift": """
            WITH s AS (
                SELECT vec_id, embedding,
                       CASE WHEN h < 90 THEN 'train'
                            WHEN h < 95 THEN 'val' ELSE 'test' END AS split
                FROM (
                    SELECT vec_id, embedding,
                           CAST('0x' || substr(md5('split:' || CAST(vec_id AS VARCHAR)), 1, 15)
                                AS BIGINT) % 100 AS h
                    FROM embeddings)
            ),
            expl AS (
                SELECT split,
                       generate_subscripts(embedding, 1) - 1 AS pos,
                       CAST(floor(unnest(embedding)::DOUBLE * 1048576.0) AS BIGINT) AS qv
                FROM s
            ),
            agg AS (
                SELECT pos,
                       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                       CAST(sum(CASE WHEN split = 'train' THEN qv ELSE 0 END) AS BIGINT) AS sum_a,
                       CAST(sum(CASE WHEN split = 'val' THEN qv ELSE 0 END) AS BIGINT) AS sum_b
                FROM expl GROUP BY 1
            )
            SELECT pos, n_a, n_b, sum_a, sum_b,
                   CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                        ELSE CAST((1000000 * abs(CAST(sum_a AS HUGEINT) * n_b
                                       - CAST(sum_b AS HUGEINT) * n_a))
                        // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) END AS shift_abs_ppm,
                   CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                        WHEN CAST(sum_a AS HUGEINT) * n_b
                             - CAST(sum_b AS HUGEINT) * n_a > 0 THEN 1
                        WHEN CAST(sum_a AS HUGEINT) * n_b
                             - CAST(sum_b AS HUGEINT) * n_a < 0 THEN -1
                        ELSE 0 END AS shift_sign
            FROM agg
        """,
        "knn_join": _knn_join_oracle(),
        "knn_join_auto": _knn_join_auto_oracle(),
        "margin_mining": _margin_mining_oracle(),
        "margin_mining_cross": _margin_mining_cross_oracle(),
        "knn_cross_join": _knn_cross_join_oracle(),
        "image_features_progressive": _image_features_progressive_oracle(),
        # repeated_spans: the ExactSubstr anchor construction — take
        # the RAW 16-char substring at EVERY position (the true Lee
        # et al. semantics; the engine's xxhash64 key is internal-only
        # and this raw-key oracle certifies no collision leaked into
        # the output), keep anchors with corpus-wide count >= 2,
        # merge consecutive survivors per doc (gaps-and-islands)
        "repeated_spans": _REPEATED_SPANS_SQL,
        # span_cut: the detection oracle embedded as a subquery, then
        # the complement segments (lag of each span's end + one tail
        # per doc) stitched back with an ordered string_agg; docs
        # without spans pass through via the left joins
        "span_cut": _span_cut_stitch_oracle(
            f"SELECT * FROM ({_REPEATED_SPANS_SQL})"
        ),
        # span_cut_keep_one: same stitch over the spans REDUCED to
        # non-survivors — per RAW span substring (the engine groups an
        # internal xxhash64 content key instead, so every run also
        # certifies no collision changed which occurrence survived),
        # the min-(doc_id, span_start) occurrence is kept, the rest cut
        "span_cut_keep_one": _span_cut_stitch_oracle(f"""
            SELECT doc_id, span_start, span_len FROM (
                SELECT k.doc_id, k.span_start, k.span_len,
                       row_number() OVER (
                           PARTITION BY k.sk
                           ORDER BY k.doc_id, k.span_start) AS rn
                FROM (
                    SELECT s.doc_id, s.span_start, s.span_len,
                           substr(dd.t, CAST(s.span_start AS INT),
                                  CAST(s.span_len AS INT)) AS sk
                    FROM ({_REPEATED_SPANS_SQL}) s
                    JOIN (SELECT doc_id, coalesce(text, '') AS t
                          FROM documents) dd USING (doc_id)
                ) k
            ) WHERE rn > 1
        """),
        # span_stats: the detection oracle aggregated per source —
        # exact integers end to end (ppm via integer //)
        "span_stats": f"""
            WITH spans AS (SELECT * FROM ({_REPEATED_SPANS_SQL})),
            per_doc AS (
                SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS sc,
                       count(*) AS ns
                FROM spans GROUP BY 1
            ),
            d AS (SELECT doc_id, source,
                         length(coalesce(text, '')) AS ch
                  FROM documents)
            SELECT d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(d.ch) AS BIGINT) AS n_chars,
                   CAST(count(p.sc) AS BIGINT) AS docs_with_spans,
                   CAST(sum(coalesce(p.ns, 0)) AS BIGINT) AS n_spans,
                   CAST(sum(coalesce(p.sc, 0)) AS BIGINT) AS span_chars,
                   CAST(CAST(1000000 AS HUGEINT) * sum(coalesce(p.sc, 0))
                        // greatest(sum(d.ch), 1) AS BIGINT) AS dup_ppm
            FROM d LEFT JOIN per_doc p USING (doc_id)
            GROUP BY 1
        """,
        # unimax_allocation: the ascending-(cap, lang) waterfilling
        # recurrence as a recursive CTE — same integer div, same visit
        # order, bit-for-bit
        "unimax_allocation": rf"""
            WITH RECURSIVE {_unimax_fill_cte(200_000, 2)}
            SELECT lang, n_tokens, cap AS cap_tokens,
                   alloc AS alloc_tokens,
                   CASE WHEN n_tokens = 0 THEN 0
                        ELSE CAST(1000000 * alloc // n_tokens AS BIGINT)
                   END AS epochs_ppm
            FROM fill WHERE rn > 0
        """,
        # unimax_sample: the realized mixture — full epochs via
        # unnest(range), the remainder prefix via the per-lang
        # hash-ordered running sum (crossing doc included)
        "unimax_sample": rf"""
            WITH RECURSIVE perdoc AS (
                SELECT doc_id, lang,
                       CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
                       CAST('0x' || substr(md5('unimax:' ||
                            CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                           AS hk
                FROM documents
            ),
            {_unimax_fill_cte(10_000, 2, counts_from="perdoc")},
            consts AS (
                SELECT lang,
                       alloc // greatest(n_tokens, 1) AS full_epochs,
                       alloc - (alloc // greatest(n_tokens, 1))
                               * n_tokens AS rem_tokens
                FROM fill WHERE rn > 0
            ),
            fullep AS (
                SELECT p.doc_id, p.lang, p.n_tokens,
                       unnest(range(0, c.full_epochs)) AS epoch
                FROM perdoc p JOIN consts c USING (lang)
            ),
            cum AS (
                SELECT p.doc_id, p.lang, p.n_tokens, c.full_epochs,
                       c.rem_tokens,
                       coalesce(sum(p.n_tokens) OVER (
                           PARTITION BY p.lang ORDER BY p.hk, p.doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS before
                FROM perdoc p JOIN consts c USING (lang)
            )
            SELECT doc_id, lang, n_tokens,
                   CAST(epoch AS BIGINT) AS epoch
            FROM fullep
            UNION ALL
            SELECT doc_id, lang, n_tokens,
                   CAST(full_epochs AS BIGINT) AS epoch
            FROM cum WHERE before < rem_tokens
        """,
        # span_probe: batch (id%10==7) anchors kept iff their RAW
        # 16-char substring occurs anywhere in the corpus (the rest);
        # same gaps-and-islands merge as repeated_spans
        "span_probe": _SPAN_PROBE_SQL,
        # span_cut_probe: the index-serving ACTION — the probe's spans
        # stitched out of the BATCH docs only (the ingest-time cut)
        "span_cut_probe": _span_cut_stitch_oracle(
            _SPAN_PROBE_SQL, doc_where="WHERE doc_id % 10 = 7"
        ),
        # source_overlap: exact pairwise shingle Jaccard between
        # sources; raw gram strings both sides (no hash caveat)
        "source_overlap": f"""
            WITH toks AS (SELECT doc_id, source, {_DUCK_TOKS} AS t
                          FROM documents),
            shing AS (SELECT source, {_DUCK_SHINGLES} AS sh FROM toks),
            posting AS (SELECT DISTINCT source AS src, unnest(sh) AS gram
                        FROM shing),
            sizes AS (SELECT src, count(*) AS sz FROM posting GROUP BY 1),
            inter AS (
                SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_inter
                FROM posting a JOIN posting b USING (gram)
                WHERE a.src < b.src GROUP BY 1, 2
            )
            SELECT src_a, src_b, CAST(n_inter AS BIGINT) AS n_inter,
                   CAST(sa.sz AS BIGINT) AS n_a,
                   CAST(sb.sz AS BIGINT) AS n_b,
                   round(CAST(n_inter AS DOUBLE)
                         / (sa.sz + sb.sz - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.src = src_a
            JOIN sizes sb ON sb.src = src_b
        """,
        "semantic_dedup": _semantic_dedup_oracle(),
        "embedding_neardup_lsh": _embedding_neardup_lsh_oracle(),
        "image_features": _image_features_oracle(),
        "image_phash": _image_phash_oracle(),
        "image_phash_pairs": _image_phash_pairs_oracle(),
        "image_clusters": _image_clusters_oracle(),
        "image_resize_features": _image_resize_features_oracle(),
        "audio_features": _audio_features_oracle(),
        "audio_fingerprint": _audio_fingerprint_oracle(),
        "scene_cuts": _scene_cuts_oracle(),
        "frame_samples": _frame_samples_oracle(),
    }
    # identical semantics, different physical plan: the de-skewed
    # as-of variant shares the plain variant's oracle
    oracles["asof_hourly_close_skew"] = oracles["asof_hourly_close"]
    # merge == full recompute (the set-union invariant the merge
    # operator exists for): the incremental posting fold is checked
    # against the plain full-corpus overlap oracle
    oracles["source_overlap_merge"] = oracles["source_overlap"]
    return oracles
