"""Semantic unit tests for the sessionization and rolling-window
operators (the oracle equality tests in test_entry_contract cover the
fixtures; these pin the edge semantics on hand-built data)."""

from __future__ import annotations

import datetime as dt

import pytest

from financial_data_ingestion_pipeline_spark.operators.analytics import (
    rolling_stats,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ticks(spark):
    rows = [
        # session 1: three events inside 30-minute gaps
        ("A", _ts("2024-01-01 09:00:00"), 10.0),
        ("A", _ts("2024-01-01 09:20:00"), 11.0),
        ("A", _ts("2024-01-01 09:49:59"), 12.0),
        # exactly 30:01 later -> strictly beyond the gap -> new session
        ("A", _ts("2024-01-01 10:20:00"), 13.0),
        # other symbol: independent sessions
        ("B", _ts("2024-01-01 09:00:00"), 1.0),
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp_ntz, price double")


def test_sessionize_gap_semantics(spark, ticks):
    out = {
        (r.symbol, str(r.session_start)): (str(r.session_end), r.n_events, r.total_value)
        for r in sessionize(
            ticks, gap="30 minutes", symbol_col="sym", ts_col="ts", value_col="price"
        ).collect()
    }
    assert out[("A", "2024-01-01 09:00:00")] == ("2024-01-01 10:19:59", 3, 33.0)
    assert out[("A", "2024-01-01 10:20:00")] == ("2024-01-01 10:50:00", 1, 13.0)
    assert out[("B", "2024-01-01 09:00:00")] == ("2024-01-01 09:30:00", 1, 1.0)
    assert len(out) == 3


def test_sessionize_boundary_exactly_gap_merges(spark):
    # touching session windows merge: an event at exactly last_ts + gap
    # continues the session (the oracle's `diff > gap` mirror); one
    # second further opens a new session
    rows = [
        ("A", _ts("2024-01-01 09:00:00"), 1.0),
        ("A", _ts("2024-01-01 09:30:00"), 2.0),
        ("B", _ts("2024-01-01 09:00:00"), 1.0),
        ("B", _ts("2024-01-01 09:30:01"), 2.0),
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp_ntz, price double")
    out = sessionize(df, "30 minutes", "sym", "ts", "price").collect()
    by_sym = {}
    for r in out:
        by_sym.setdefault(r.symbol, []).append(r)
    assert len(by_sym["A"]) == 1 and by_sym["A"][0].n_events == 2
    assert len(by_sym["B"]) == 2


def test_rolling_stats_trailing_window(spark, ticks):
    out = {
        (r.symbol, str(r.ts)): (r.roll_n, r.roll_sum, r.roll_avg_micro)
        for r in rolling_stats(
            ticks, window_seconds=600, symbol_col="sym", ts_col="ts",
            value_col="price",
        ).collect()
    }
    # 09:20 sees only itself (09:00 is outside the exact 600s range? no:
    # 09:20 - 09:00 = 1200s > 600s -> excluded)
    assert out[("A", "2024-01-01 09:00:00")] == (1, 10.0, 10_000_000)
    assert out[("A", "2024-01-01 09:20:00")] == (1, 11.0, 11_000_000)
    assert out[("A", "2024-01-01 09:49:59")] == (1, 12.0, 12_000_000)
    assert out[("B", "2024-01-01 09:00:00")] == (1, 1.0, 1_000_000)


def test_rolling_stats_inclusive_boundary(spark):
    # an event exactly window_seconds earlier is INSIDE the range frame
    rows = [
        ("A", _ts("2024-01-01 09:00:00"), 10.0),
        ("A", _ts("2024-01-01 09:10:00"), 30.0),
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp_ntz, price double")
    out = {str(r.ts): (r.roll_n, r.roll_avg_micro) for r in rolling_stats(
        df, window_seconds=600, symbol_col="sym", ts_col="ts", value_col="price"
    ).collect()}
    assert out["2024-01-01 09:10:00"] == (2, 20_000_000)


def test_funnel_strict_ordering(spark):
    """A click before the first view does not advance the funnel; a
    user with no view emits no row; stage timestamps are the FIRST
    qualifying event after the prior stage."""
    import datetime as dt

    from financial_data_ingestion_pipeline_spark.operators.analytics import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: click at t1 BEFORE view at t2; click at t4 after -> counts
        (1, t(1), "click"), (1, t(2), "view"), (1, t(4), "click"),
        (1, t(3), "purchase"),  # purchase before the qualifying click -> no
        # user 2: full ordered funnel
        (2, t(0), "view"), (2, t(1), "click"), (2, t(2), "purchase"),
        # user 3: never views
        (3, t(0), "click"), (3, t(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}
    assert out[1].first_view == t(2) and out[1].first_click == t(4)
    assert out[1].first_purchase is None
    assert out[2].first_purchase == t(2)


def test_anomaly_flags_spike_only(spark):
    import datetime as dt

    from financial_data_ingestion_pipeline_spark.operators.analytics import (
        anomaly_flags,
    )

    rows = []
    # mild alternating noise, then one hard spike at the end
    for i in range(30):
        rows.append(
            ("A", dt.datetime(2024, 1, 1, 9, 0, i), 100.0 + (i % 3))
        )
    rows.append(("A", dt.datetime(2024, 1, 1, 9, 0, 59), 500.0))
    df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
    out = anomaly_flags(
        df, window_rows=200, z_thresh=3.0, min_n=10,
        symbol_col="sym", ts_col="ts", value_col="v",
    ).collect()
    assert len(out) == 1
    assert out[0].value == 500.0 and out[0].z > 3.0
    assert out[0].roll_n == 31


def test_table_profile_counts(spark):
    from financial_data_ingestion_pipeline_spark.operators.quality import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)], "id long, tag string"
    )
    got = {r.column: r for r in table_profile(df, ["id", "tag"]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_null == 0
    assert got["id"].n_distinct == 4
    assert got["tag"].n_null == 2 and got["tag"].null_frac == 0.5
    assert got["tag"].n_distinct == 1  # NULLs don't count as a value


def test_scd2_history_intervals(spark):
    import datetime as dt

    from financial_data_ingestion_pipeline_spark.operators.analytics import (
        scd2_history,
    )

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    rows = [
        (1, t(9), 7, "price", 10.0),
        (2, t(11), 7, "price", 12.0),
        (3, t(10), 7, "price", 11.0),
        (4, t(9), 8, "price", 5.0),  # other key: independent chain
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    got = {
        (r.user_id, r.value): (r.valid_from.hour,
                               r.valid_to.hour if r.valid_to else None,
                               r.is_current)
        for r in scd2_history(ev).collect()
    }
    # intervals chain in event-time order regardless of arrival order
    assert got == {
        (7, 10.0): (9, 10, False),
        (7, 11.0): (10, 11, False),
        (7, 12.0): (11, None, True),
        (8, 5.0): (9, None, True),
    }


def test_retention_cohorts_offsets(spark):
    import datetime as dt

    from financial_data_ingestion_pipeline_spark.operators.analytics import (
        retention_cohorts,
    )

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        (1, d(1), "view"), (1, d(1, 5), "click"), (1, d(3), "view"),
        (2, d(2), "view"), (2, d(3), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (str(r.cohort_day), r.day_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 1): 1,
    }


def test_salted_join_identical_to_plain(spark, sf_dir):
    from financial_data_ingestion_pipeline_spark.operators.joins import salted_join
    from financial_data_ingestion_pipeline_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = li.join(orders, "o_orderkey")
    salted = salted_join(li, orders, "o_orderkey", n_salts=8)
    assert salted.columns == plain.columns
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # the physical join key carries the salt: hashpartitioning on both
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_ewma_truncated_halflife_exact(spark):
    """EWMA on a hand-computed series: full-depth rows use the 255/256
    weight ladder, leading rows normalize by their shorter ladder, and
    a constant series smooths to itself exactly."""
    import datetime as dt

    from financial_data_ingestion_pipeline_spark.operators import analytics

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("A", base + dt.timedelta(seconds=i), i, float(v))
        for i, v in enumerate([10.0, 20.0, 40.0])
    ] + [
        ("C", base + dt.timedelta(seconds=i), 100 + i, 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = {
        r.event_id: r
        for r in analytics.ewma_smooth(
            df, depth=8, symbol_col="event_type", ts_col="ts",
            value_col="value", id_cols=("event_id",),
        ).collect()
    }
    # m=1: norm 128 -> value itself
    assert out[0].ewma == 10.0 and out[0].n_terms == 1
    # m=2: (20*128 + 10*64) / 192
    assert out[1].ewma == (20.0 * 128 + 10.0 * 64) / 192
    # m=3: (40*128 + 20*64 + 10*32) / 224
    assert out[2].ewma == (40.0 * 128 + 20.0 * 64 + 10.0 * 32) / 224
    # constant series: every weighted mean is the constant
    assert all(out[100 + i].ewma == 5.0 for i in range(10))
    assert out[109].n_terms == 8


def test_expect_report_null_is_violation(spark):
    """A NULL predicate result must count as a violation, the ppm is
    exact integer floor, and the threshold gates pass/fail."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 20.0)],
        "id long, v double",
    )
    out = {
        r.rule: r
        for r in quality.expect_report(
            df,
            [("v_nonneg", F.col("v") >= 0), ("id_present", F.col("id").isNotNull())],
            max_violation_frac=0.25,
        ).collect()
    }
    r = out["v_nonneg"]
    assert (r.n_rows, r.n_violations) == (4, 2)  # -5 and NULL both violate
    assert r.violation_ppm == 500000
    assert not r.passed
    assert out["id_present"].passed and out["id_present"].n_violations == 0


def test_pit_join_interval_and_leakage_semantics(spark):
    """Point-in-time join: facts see the version current AT their
    timestamp (boundary inclusive on valid_from, exclusive on
    valid_to), facts before any version get NULLs, and future
    versions can never leak backward."""
    import datetime as dt

    from financial_data_ingestion_pipeline_spark.operators.joins import pit_join

    t = lambda m: dt.datetime(2024, 1, 1, 9, m)  # noqa: E731
    dims = spark.createDataFrame(
        [
            (1, 10.0, t(10), t(20)),
            (1, 20.0, t(20), None),   # current
            (2, 5.0, t(30), None),
        ],
        "user_id long, value double, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, t(5)),    # before any version -> NULL
            (101, 1, t(10)),   # boundary: exactly valid_from -> v10
            (102, 1, t(19)),   # inside first interval
            (103, 1, t(20)),   # boundary: valid_to exclusive -> v20
            (104, 1, t(45)),   # open current interval
            (105, 2, t(25)),   # key exists, version not yet -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r.event_id: r.value
        for r in pit_join(facts, dims, ["user_id"]).collect()
    }
    assert got == {100: None, 101: 10.0, 102: 10.0, 103: 20.0,
                   104: 20.0, 105: None}


def test_event_transitions_counts_and_ppm(spark):
    """Hand-built stream: transitions count consecutive pairs per user
    in (ts, event_id) order; ppm shares are exact integer division."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.operators import analytics
    rows = [
        # user 1: a -> b -> a   (ties on ts broken by event_id)
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:01:00", "a"),
        # user 2: a -> b
        (4, 2, "2024-01-01 00:00:00", "a"),
        (5, 2, "2024-01-01 00:05:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r.src, r.dst): (r.n_transitions, r.total_from_src, r.prob_ppm)
        for r in analytics.event_transitions(df).collect()
    }
    assert out[("a", "b")] == (2, 2, 1000000)
    assert out[("b", "a")] == (1, 1, 1000000)
    assert len(out) == 2


def test_max_drawdown_hand_series(spark):
    """Known price path: peak 10 -> trough 4 gives drawdown -6 at the
    trough's (ts, id); a monotone series has drawdown 0."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.operators import analytics

    rows = [
        (1, "A", "2024-01-01 00:00:00", 10.0),
        (2, "A", "2024-01-01 00:01:00", 7.0),
        (3, "A", "2024-01-01 00:02:00", 4.0),
        (4, "A", "2024-01-01 00:03:00", 9.0),
        (5, "B", "2024-01-01 00:00:00", 1.0),
        (6, "B", "2024-01-01 00:01:00", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.symbol: r for r in analytics.max_drawdown(df).collect()}
    assert out["A"].max_drawdown == -6.0
    assert out["A"].peak_value == 10.0
    assert out["A"].trough_event == 3
    assert out["B"].max_drawdown == 0.0
    assert out["B"].trough_event == 5  # first row wins ties at dd=0


def test_pattern_match_negation_semantics(spark):
    """A->B within gap matches; an intervening C kills the match; C
    before A does not; B outside the gap does not."""
    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.operators import analytics

    rows = [
        # user 1: click -> purchase (match, 10 min wait)
        (1, 1, "2024-01-01 10:00:00", "click"),
        (2, 1, "2024-01-01 10:10:00", "purchase"),
        # user 2: click -> error -> purchase (killed by negation)
        (3, 2, "2024-01-01 10:00:00", "click"),
        (4, 2, "2024-01-01 10:05:00", "error"),
        (5, 2, "2024-01-01 10:10:00", "purchase"),
        # user 3: error -> click -> purchase (C before A: match)
        (6, 3, "2024-01-01 09:00:00", "error"),
        (7, 3, "2024-01-01 10:00:00", "click"),
        (8, 3, "2024-01-01 10:30:00", "purchase"),
        # user 4: click -> purchase 2h later (outside gap)
        (9, 4, "2024-01-01 10:00:00", "click"),
        (10, 4, "2024-01-01 12:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = analytics.pattern_match(
        df, first="click", second="purchase", without="error", gap="1 hour"
    ).collect()
    matched = {(r.user_id, r.first_event, r.second_event, r.wait_seconds)
               for r in out}
    assert matched == {(1, 1, 2, 600), (3, 7, 8, 1800)}
