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

from financial_data_ingestion_pipeline_spark.operators import (  # noqa: E402
    analytics,
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


def _q_invalid_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return quality.invalid_rows(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def _q_validity_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return quality.validity_summary(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"], "l_returnflag"
    )


def _q_missing_symbols(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
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


def _q_distinct_symbols(spark, sf_dir):
    return _events(spark, sf_dir).select("event_type").distinct()


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
        e.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(F.col("event_type").alias("symbol"), "rank", "event_id", "value")
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
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn("avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "price_change": _q_price_change,
        "daily_ohlc": _q_daily_ohlc,
        "hourly_ohlc": _q_hourly_ohlc,
        "resample_5min": _q_resample_5min,
        "events_clean": _q_events_clean,
        "invalid_rows": _q_invalid_rows,
        "validity_summary": _q_validity_summary,
        "missing_symbols": _q_missing_symbols,
        "ohlc_reconcile": _q_ohlc_reconcile,
        "distinct_symbols": _q_distinct_symbols,
        "date_in_counts": _q_date_in_counts,
        "between_sum": _q_between_sum,
        "union_extremes": _q_union_extremes,
        "top_events": _q_top_events,
        "tpch_q1": _q_tpch_q1,
    }


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


def oracle_sql() -> dict[str, str]:
    return {
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
        "invalid_rows": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity < 0
               OR l_extendedprice IS NULL OR l_extendedprice < 0
               OR l_discount IS NULL OR l_discount < 0
               OR l_tax IS NULL OR l_tax < 0
        """,
        "validity_summary": """
            SELECT l_returnflag AS group_key,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 0
                             OR l_extendedprice IS NULL OR l_extendedprice < 0
                             OR l_discount IS NULL OR l_discount < 0
                             OR l_tax IS NULL OR l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
            FROM lineitem GROUP BY 1
        """,
        "missing_symbols": """
            SELECT n.* FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
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
        "distinct_symbols": "SELECT DISTINCT event_type FROM events",
        "date_in_counts": f"""
            SELECT event_type AS symbol, ts::date AS trade_date, count(*) AS n_events
            FROM events
            WHERE ts::date = DATE '{DATE_A}' OR ts::date = DATE '{DATE_B}'
            GROUP BY 1, 2
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
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                       AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                            * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
                       AS sum_charge,
                   count(*) AS count_order,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2
        """,
    }
