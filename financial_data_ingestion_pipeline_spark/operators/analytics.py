"""Analytical queries over the warehouse (dp:258-347).

The flagship is the price-change query (dp:261-281): a CTE computing
each symbol's price on two dates via conditional aggregation (A4), a
derived percentage-change metric (A5/P11), and a HAVING-style filter
(P10).  Expressed as one groupBy with ``max(when(...))`` pivot columns —
a single shuffle, with the date-IN predicate (P8) pushed to the scan.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def price_change(
    ticks: DataFrame,
    date_a: str | dt.date,
    date_b: str | dt.date,
    min_pct_change: float | None = 3.0,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
) -> DataFrame:
    """Symbols whose max price moved more than ``min_pct_change`` percent
    between two dates (dp:261-281).

    Columns: ``symbol, price_a, price_b, pct_change`` (reference:
    ``source_symbol, ltp_april_4, ltp_april_5, percentage_change``).
    ``max(when(date=d, price))`` keeps this a single scan + single
    shuffle instead of a self-join; the two-date IN filter is pushed
    down to the source.
    """
    d_a, d_b = F.lit(str(date_a)).cast("date"), F.lit(str(date_b)).cast("date")
    day = F.to_date(F.col(ts_col))
    pivoted = (
        ticks.filter(day.isin(d_a, d_b))
        .groupBy(F.col(symbol_col).alias("symbol"))
        .agg(
            F.max(F.when(day == d_a, F.col(price_col))).alias("price_a"),
            F.max(F.when(day == d_b, F.col(price_col))).alias("price_b"),
        )
    )
    result = pivoted.withColumn(
        "pct_change",
        F.round((F.col("price_b") - F.col("price_a")) / F.col("price_a") * 100, 6),
    )
    if min_pct_change is not None:
        result = result.filter(F.col("pct_change") > min_pct_change)
    return result


def filter_date_in(
    ticks: DataFrame, dates: Sequence[str], ts_col: str = "timestamp"
) -> DataFrame:
    """``WHERE DATE(timestamp) IN (...)`` (P8, dp:268-269)."""
    date_lits = [F.lit(d).cast("date") for d in dates]
    return ticks.filter(F.to_date(F.col(ts_col)).isin(*date_lits))


def filter_between(
    ticks: DataFrame, from_ts: str, to_ts: str, ts_col: str = "timestamp"
) -> DataFrame:
    """``WHERE timestamp BETWEEN a AND b`` (P9, dp:336-337)."""
    return ticks.filter(
        F.col(ts_col).between(
            F.lit(from_ts).cast("timestamp_ntz"), F.lit(to_ts).cast("timestamp_ntz")
        )
    )


def sessionize(
    ticks: DataFrame,
    gap: str = "30 minutes",
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    value_col: str = "ltp",
) -> DataFrame:
    """Activity sessions per symbol via ``F.session_window``: a session
    extends while consecutive events arrive within ``gap`` INCLUSIVE
    (touching windows merge — an event at exactly ``last_ts + gap``
    continues the session); only a strictly larger gap opens a new one.
    Identical to the gaps-and-islands ``lag diff > gap`` formulation,
    which is how the DuckDB oracle replays it.  ``session_end`` is
    ``last_ts + gap`` — Spark's native session semantics.

    One shuffle on (symbol, merged-session key) with map-side partial
    aggregation; the same expression runs unchanged on a stream (session
    windows are Structured Streaming's native dynamic-gap state).  The
    value sum is decimal (shuffle-order independent) cast back to
    double.
    """
    return (
        ticks.groupBy(
            F.session_window(F.col(ts_col).cast("timestamp"), gap).alias("w"),
            F.col(symbol_col).alias("symbol"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(28,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "symbol",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def rolling_stats(
    ticks: DataFrame,
    window_seconds: int = 600,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    value_col: str = "ltp",
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-event trailing time-range statistics (count / sum / mean of
    ``value_col`` over the last ``window_seconds``), the moving-average
    primitive of every tick screen.

    ``rangeBetween`` over integer epoch-MICROseconds — sub-second
    precision, identical frame boundaries in any engine, and ties at the
    same instant all join the frame in both.  One shuffle + sort per
    symbol; for a pathologically hot symbol apply the same
    (symbol, coarse-bucket) de-skew as ``operators/asof.py`` with a
    one-window-length carry overlap.  Sum is decimal (frame-order
    independent) cast back; the mean is EXACT integer micro-units
    (``roll_avg_micro = floor(10^6 * sum / n)``, decimal-integer
    arithmetic end to end) — a 6-dp ROUNDED double mean sat on a
    half-boundary whenever ``n`` divided the sum's cents (observed at
    the heaps1 decade: 2072.93/32 = 64.7790625 exactly), where
    engines' half-rules legitimately disagree.

    Cost rule: Spark re-evaluates a sliding frame's aggregates from
    scratch per row (no inverse aggregates), so this RANGE form costs
    O(rows x rows-per-window) — fine for sparse/bounded windows (the
    contract query's 10-minute window holds a handful of rows), wrong
    for dense data under a wide window.  There, use the trailing-ROWS
    cumsum-minus-lag formulation (:func:`anomaly_flags` internals),
    which is O(n) for any window size.
    """
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(micros)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    dec_sum = F.sum(F.col(value_col).cast("decimal(28,2)")).over(w)
    n = F.count(F.lit(1)).over(w)
    base = ticks.select(
        *id_cols,
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        n.alias("roll_n"),
        dec_sum.alias("__rs"),
    )
    return base.select(
        *id_cols,
        "symbol",
        "ts",
        "value",
        "roll_n",
        F.col("__rs").cast("double").alias("roll_sum"),
        F.expr(
            "CAST(CAST(__rs * 1000000 AS DECIMAL(38,0)) DIV roll_n"
            " AS BIGINT)"
        ).alias("roll_avg_micro"),
    )


def anomaly_flags(
    ticks: DataFrame,
    window_rows: int = 200,
    z_thresh: float = 3.0,
    min_n: int = 10,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    value_col: str = "ltp",
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value sits
    more than ``z_thresh`` standard deviations from the mean of the
    trailing ``window_rows`` observations per symbol — the monitoring
    screen a live tick/metric pipeline keeps open.

    The frame is a trailing ``window_rows`` ROWS window (ordered by
    (event time, id) — a total order, so the frame is identical in any
    engine) rather than a time-RANGE, and it is evaluated as CUMULATIVE
    sums minus their ``lag(window_rows)`` — two O(n) running passes over
    one sort.  Spark re-evaluates a sliding frame's aggregates from
    scratch per row (no inverse aggregates), so expressing the trailing
    sum directly costs O(n x frame): a 1-day range over sf0.1 measured
    22 s, the direct 200-row frame 5 s, the cumsum-minus-lag form under
    1 s — all with identical flagged rows.  The subtraction happens in
    exact DECIMAL, so this is not a float cancellation risk.

    Cross-engine exactness: both moments accumulate as DECIMAL sums
    (frame-order independent) and convert to double ONCE; the variance
    ``(s2 - s1*s1/n)/n`` then runs in IEEE doubles in a fixed written
    order, clamped at zero before the (correctly-rounded) sqrt, so the
    flagged row set is bit-reproducible in any engine.  Windows with
    fewer than ``min_n`` events or zero deviation are never flagged.

    The trailing MEAN is deliberately not emitted: a 2-dp decimal sum
    divided by a power-of-two count can land exactly on a 6-dp rounding
    boundary where engines' half-rules differ (observed at sf0.1 —
    n=640 gave mean ...0625).  ``z`` divides by a sqrt, whose output is
    irrational off the degenerate cases, so its 6-dp round is stable;
    the mean itself is :func:`rolling_stats`' job.

    Output: id cols, symbol, ts, value, roll_n, z.
    """
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order_cols = [micros] + [F.col(c) for c in id_cols]
    w_run = (
        Window.partitionBy(symbol_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy(symbol_col).orderBy(*order_cols)
    dec = F.col(value_col).cast("decimal(18,2)")
    cum1 = F.sum(dec).over(w_run)
    cum2 = F.sum(dec * dec).over(w_run)
    rn = F.row_number().over(w_lag)

    def trail(cum):
        prev = F.lag(cum, window_rows).over(w_lag)
        return (cum - F.coalesce(prev, F.lit(0).cast("decimal(18,2)"))).cast(
            "double"
        )

    s1 = trail(cum1)
    s2 = trail(cum2)
    n = F.least(rn, F.lit(window_rows)).cast("long")
    nd = n.cast("double")
    mean = s1 / nd
    var = F.greatest((s2 - s1 * s1 / nd) / nd, F.lit(0.0))
    std = F.sqrt(var)
    z = F.round((F.col(value_col) - mean) / std, 6)
    return (
        ticks.select(
            *id_cols,
            F.col(symbol_col).alias("symbol"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            n.alias("roll_n"),
            std.alias("__std"),
            z.alias("z"),
        )
        .filter(
            (F.col("roll_n") >= min_n)
            & (F.col("__std") > 0.0)
            & (F.abs(F.col("z")) > z_thresh)
        )
        .drop("__std")
    )


def group_quantiles(
    ticks: DataFrame,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    symbol_col: str = "source_symbol",
    value_col: str = "ltp",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact discrete per-group quantiles of ``value_col``.

    Deterministic "element at position ceil(q*n)" semantics over the
    total order (value, id) — no interpolation arithmetic, so the
    selected value is byte-identical in any engine (interpolated
    quantiles differ across engines in the last ulp; a picked element
    cannot).  The position product ``q * n`` is one IEEE double
    multiply + ceil, reproduced exactly by the oracle.

    Plan: one window pass (rank + group size share a single sort on the
    group key) feeding one conditional aggregation — the same exchange
    serves both, so the operator costs one shuffle.  The per-group sort
    is the scale bound; for pathologically hot groups switch to a
    two-phase sampled-partition quantile, trading a second pass for
    bounded tasks.

    Output: symbol, q50/q90/q99-style columns (one per requested q).
    """
    w = Window.partitionBy(symbol_col).orderBy(F.col(value_col), F.col(id_col))
    wn = Window.partitionBy(symbol_col)
    # NULL values are excluded (standard quantile semantics) — also
    # sidesteps the engines' opposite NULLS FIRST/LAST sort defaults
    ticks = ticks.filter(F.col(value_col).isNotNull())
    ranked = ticks.select(
        F.col(symbol_col).alias("symbol"),
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(
                    F.lit(1), F.ceil(F.lit(float(q)) * F.col("n")).cast("long")
                ),
                F.col("v"),
            )
        ).alias(f"q{int(q * 100)}")
        for q in quantiles
    ]
    return ranked.groupBy("symbol").agg(*aggs)


def pairs_within(
    events: DataFrame,
    window_seconds: int = 60,
    symbol_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Count of same-group event pairs at most ``window_seconds`` apart
    — a RANGE self-join, the classic Spark weak spot (a naive theta
    join is a per-group cartesian product).

    Banded formulation: bucket every event to
    ``floor(epoch_us / window)``; a qualifying pair either shares a
    bucket or sits in adjacent buckets, so the join becomes TWO
    equi-joins on (group, bucket) — same-bucket (ordered by id to count
    each unordered pair once) plus consecutive-bucket (ordered by
    construction) — unioned before one count aggregation.  Work is
    quadratic only within a bucket (bounded by the group's event rate *
    window), never within a group's whole history; AQE splits residual
    hot buckets.  All comparisons are integer microseconds — no float
    anywhere, so any engine counts the identical pair set.

    Output: symbol, n_pairs.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    win_us = window_seconds * 1_000_000
    e = events.select(
        F.col(symbol_col).alias("symbol"),
        F.col(id_col).alias("id"),
        us.alias("us"),
        (us.cast("long") - (us.cast("long") % win_us)).alias("bucket"),
    )
    a = e.select("symbol", F.col("id").alias("id_a"), F.col("us").alias("us_a"), "bucket")
    b = e.select("symbol", F.col("id").alias("id_b"), F.col("us").alias("us_b"), "bucket")
    same = (
        a.join(b, ["symbol", "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= win_us)
        )
        .select("symbol")
    )
    adj = (
        a.withColumn("bucket", F.col("bucket") + win_us)
        .join(b, ["symbol", "bucket"])
        .filter(F.col("us_b") - F.col("us_a") <= win_us)
        .select("symbol")
    )
    return (
        same.unionAll(adj)
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the first time each stage was
    reached STRICTLY AFTER the previous stage (view -> click ->
    purchase style).  A user's stage-k timestamp is NULL if they never
    did stage k after completing stage k-1.

    Each stage is one conditional min-aggregate over a user-keyed
    groupBy; stage k joins the (user, t_{k-1}) frame back to the
    pre-filtered event slice for stage k.  All shuffles hash on the
    user key, so successive stages reuse the same partitioning
    (ReusedExchange), and each stage's input is filtered to ONE event
    type before it shuffles — the probe never moves the full log.

    Output: user rows with ``first_<stage>`` timestamp columns, only
    for users who reached stage 1.
    """
    first = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"first_{stages[0]}"))
    )
    out = first
    prev = f"first_{stages[0]}"
    for stage in stages[1:]:
        nxt = f"first_{stage}"
        stage_events = events.filter(F.col(type_col) == stage).select(
            user_col, F.col(ts_col).alias("_t")
        )
        reached = (
            out.select(user_col, F.col(prev).alias("_p"))
            .join(stage_events, user_col)
            .filter(F.col("_t") > F.col("_p"))
            .groupBy(user_col)
            .agg(F.min("_t").alias(nxt))
        )
        out = out.join(reached, user_col, "left")
        prev = nxt
    return out


def scd2_history(
    updates: DataFrame,
    key_cols: Sequence[str] = ("event_type", "user_id"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an update stream:
    each update row becomes a validity interval ``[valid_from,
    valid_to)`` closed by the NEXT update of the same key (open — NULL
    — for the current row).  The standard warehouse build for
    "attribute value as of time T" lookups, and the interval table an
    as-of join can range-probe.

    One window over the entity key (``lead`` on the same (ts, id) total
    order :func:`value_streaks`-style ops use, so ties are
    deterministic): a single hash exchange, O(1) per row, no
    self-join — the naive "join each row to its successor" pairs the
    table with itself on an inequality and dies at scale.

    Output: key cols, value, valid_from, valid_to, is_current.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(id_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    return updates.select(
        *keys,
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day,
    counted on each subsequent day offset they return.

    Two user-keyed aggregates (first day, then distinct users per
    (cohort, offset)) — the cohort dimension is derived from the data
    and joined back along the same user-hash partitioning.

    Output: ``cohort_day, day_offset, n_users``.
    """
    day = F.to_date(F.col(ts_col))
    firsts = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    return (
        events.select(user_col, day.alias("_day"))
        .join(firsts, user_col)
        .select(
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def bounded_baskets(
    lineitem: DataFrame,
    max_basket: int = 32,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """The shared basket universe of the market-basket family: one
    ``collect_set`` aggregate per basket (map-side combined — the set
    dedups as it merges) with the size cap applied to the array (the
    standard frequent-itemset guard bounding pair fan-out).  Both
    :func:`copurchase_pairs` and its consumers (association-rule
    confidences, item supports) derive from THIS frame, so every
    probability shares one basket-universe definition — the cap can
    never drift between numerator and denominator.

    Output: ``basket, _items`` (sorted distinct item array, size <=
    ``max_basket``).
    """
    return (
        lineitem.groupBy(F.col(basket_col).alias("basket"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("_items"))
        .filter(F.size("_items") <= max_basket)
    )


def copurchase_pairs(
    lineitem: DataFrame,
    min_support: int = 2,
    max_basket: int = 32,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    baskets: DataFrame | None = None,
) -> DataFrame:
    """Market-basket co-occurrence: item pairs bought together in at
    least ``min_support`` baskets — the candidate-generation step of
    association mining / co-purchase recommenders.

    Scale design: ONE ``collect_set`` aggregate per basket (map-side
    combined — the set dedups as it merges), the size cap applied to
    the array (the standard frequent-itemset guard: one pathological
    10^4-item basket would otherwise yield 10^8 pairs — at 100 TB the
    cap bounds fan-out exactly like the dedup family's df-cap), and
    the i<j pairs generated ARRAY-SIDE — no self-join, no second scan,
    so the whole operator is two shuffles (basket agg, pair agg).  The
    earlier posting-self-join form planned 7 exchanges and ran ~3x
    slower at sf0.1.

    Pairs come from two chained generators (posexplode the anchor,
    then explode the i<j suffix slice) rather than one nested
    transform-of-transforms: generators run inside codegen while a
    lambda body is interpreted per ELEMENT, and the struct-wrapping
    the nested form needed disappears — measured ~15% faster at
    sf0.1, identical output.

    Callers that already hold the bounded basket frame (e.g. rule
    mining, which also needs item supports and the basket total from
    the SAME universe) pass it via ``baskets`` so the collect_set
    aggregation over the fact table runs once, not once per consumer.

    Output: ``item_a, item_b, support``.
    """
    if baskets is None:
        baskets = bounded_baskets(lineitem, max_basket, basket_col, item_col)
    baskets = baskets.filter(F.size("_items") >= 2)
    anchored = baskets.select(
        F.posexplode("_items").alias("i", "item_a"), F.col("_items")
    )
    return (
        anchored.select(
            "item_a",
            F.explode(
                F.expr("slice(_items, i + 2, size(_items) - i - 1)")
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def ewma_smooth(
    ticks: DataFrame,
    depth: int = 8,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    value_col: str = "ltp",
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Truncated exponential moving average (half-life decay) per
    symbol — the trend-smoothing companion to :func:`rolling_stats`'s
    flat window.

    The classic recursive EWMA is order-sequential and accumulates
    float error engine-dependently; this is the ``depth``-term
    truncation with weights 2^(depth-1-k), which makes the arithmetic
    reproducible bit-for-bit: every product scales a double by a power
    of two (IEEE-exact), terms are added oldest-last in one fixed
    order, and the single division normalizes by the exact integer
    2^depth - 2^(depth-m) for m available terms — so a leading row's
    shorter history normalizes correctly instead of biasing toward 0.
    Truncation error vs the infinite EWMA is 2^-depth of the weight
    mass (0.4% at depth 8).

    All ``depth`` lags share one window spec, so Spark evaluates them
    in a single per-symbol sort pass — one shuffle, O(depth) state per
    row, the same cost profile as any windowed lag at 100 TB (de-skew
    a pathologically hot symbol exactly as in ``operators/asof.py``).

    Output: id_cols, symbol, ts, value, n_terms, ewma.
    """
    w = Window.partitionBy(symbol_col).orderBy(ts_col, *id_cols)
    terms = [
        F.lag(F.col(value_col), k).over(w) * F.lit(float(1 << (depth - 1 - k)))
        for k in range(depth)
    ]
    total = F.coalesce(terms[0], F.lit(0.0))
    for t in terms[1:]:
        total = total + F.coalesce(t, F.lit(0.0))
    n_terms = sum(
        (
            F.when(F.lag(F.col(value_col), k).over(w).isNotNull(), 1).otherwise(0)
            for k in range(depth)
        ),
        F.lit(0),
    )
    # norm(m) = 2^depth - 2^(depth-m): tiny domain, so a literal CASE
    # map beats a column-amount shift (which F.shiftleft can't take)
    norm = F.lit(1 << depth) - F.lit(1)
    for m in range(1, depth + 1):
        norm = F.when(
            n_terms == m, F.lit((1 << depth) - (1 << (depth - m)))
        ).otherwise(norm)
    return ticks.select(
        *id_cols,
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        n_terms.cast("long").alias("n_terms"),
        # all-null ladder (every slot NULL): no data -> NULL, never a
        # fake 0.0 — streaming and oracle share the convention
        F.when(n_terms > 0, total / norm.cast("double")).alias("ewma"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order user-journey transition matrix: for every ordered
    pair of consecutive events within a user's stream, count the
    (src -> dst) transition and its share of all transitions leaving
    ``src`` — the Markov-chain view marketing/product analytics builds
    over clickstreams (and the input to next-event prediction
    baselines).

    Ordering is (ts, tie_col) within each user, so simultaneous events
    sequence deterministically.  Probabilities are exact integer ppm
    (``1e6 * n div total``) — no float division in the result.

    Plan shape: ONE shuffle for the per-user lead() window; the
    (src, dst) count is a vocabulary-sized aggregate whose partial
    aggregation collapses each task's output to |event types|^2 rows;
    the per-src totals derive from the transition counts themselves
    (grouping the ALREADY aggregated frame — no second scan) and ride
    back on a broadcast join keyed by src.

    Output: src, dst, n_transitions, total_from_src, prob_ppm.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    pairs = events.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("src").agg(
        F.sum("n_transitions").alias("total_from_src")
    )
    return (
        counts.join(F.broadcast(totals), "src")
        .select(
            "src",
            "dst",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.col("total_from_src").cast("long").alias("total_from_src"),
            F.expr("(1000000 * n_transitions) div total_from_src")
            .cast("long")
            .alias("prob_ppm"),
        )
    )


def max_drawdown(
    events: DataFrame,
    symbol_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """Per-symbol maximum drawdown: the worst peak-to-trough drop of a
    running price series — the risk metric every financial warehouse
    derives from tick history (dp's OHLC domain).

    Per row, ``drawdown = value - running_max(value)`` over the
    (ts, tie) order: both operands come straight from the scan, so the
    subtraction is one IEEE op any engine reproduces.  The trough is
    the lexicographic minimum of (drawdown, ts, tie) — a deterministic
    argmin even with ties — and peak/drawdown aggregate with exact
    min/max.

    Plan shape: one window shuffle (partition by symbol — the same
    per-symbol history constraint as the plain as-of join; for a
    single hot symbol at 100 TB use the bucketed-carryover pattern of
    ``asof_hourly_close_skew``), then a per-symbol aggregate that
    collapses map-side.

    Output: symbol, peak_value, max_drawdown (<= 0), trough_ts,
    trough_event, n_ticks.
    """
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = (F.col(value_col) - F.max(value_col).over(w)).alias("__dd")
    per_row = events.select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("__ts"),
        F.col(tie_col).alias("__tie"),
        F.col(value_col).alias("__val"),
        dd,
    )
    w_rank = Window.partitionBy("symbol").orderBy("__dd", "__ts", "__tie")
    ranked = per_row.withColumn("__rn", F.row_number().over(w_rank))
    return (
        ranked.groupBy("symbol")
        .agg(
            F.max("__val").alias("peak_value"),
            F.min("__dd").alias("max_drawdown"),
            F.max(F.when(F.col("__rn") == 1, F.col("__ts"))).alias("trough_ts"),
            F.max(F.when(F.col("__rn") == 1, F.col("__tie")))
            .cast("long")
            .alias("trough_event"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def fill_daily_gaps(
    events: DataFrame,
    symbol_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """Calendar gap-fill: per symbol, one row for EVERY calendar day
    between its first and last observation, carrying the latest close
    forward across missing days (holiday/halt handling in a daily
    price warehouse — the dp domain's classic spine join).

    The close of an observed day is the value of its lexicographically
    last (ts, tie) tick — deterministic under ties.  The date spine is
    ``sequence(min_date, max_date)`` per symbol (one explode off a
    per-symbol min/max aggregate — no driver-side calendar, no join
    against a calendar table), and the carry-forward is one
    ``last(close, ignorenulls)`` window per symbol ordered by day.

    Plan shape: one (symbol, day) aggregate, a per-symbol min/max
    aggregate that stays broadcast-sized (|symbols| rows), and one
    window shuffle for the fill.  Same per-symbol-history partitioning
    constraint as the as-of family.

    Output: symbol, d (date), close, is_filled (true = carried).
    """
    per_day = (
        events.select(
            F.col(symbol_col).alias("symbol"),
            F.to_date(ts_col).alias("d"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tie_col).alias("tie"),
                F.col(value_col).alias("v"),
            ).alias("__tick"),
        )
        .groupBy("symbol", "d")
        .agg(F.max("__tick")["v"].alias("__close"))
    )
    spine = (
        per_day.groupBy("symbol")
        .agg(F.min("d").alias("__d0"), F.max("d").alias("__d1"))
        .select(
            "symbol",
            F.explode(F.sequence("__d0", "__d1")).alias("d"),
        )
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(per_day, ["symbol", "d"], "left")
        .select(
            "symbol",
            "d",
            F.last("__close", ignorenulls=True).over(w).alias("close"),
            F.col("__close").isNull().alias("is_filled"),
        )
    )


def pattern_match(
    events: DataFrame,
    first: str,
    second: str,
    without: str,
    gap: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Restricted complex-event-pattern detection (the
    MATCH_RECOGNIZE / Flink-CEP staple Spark has no native operator
    for): emit every ``second`` event that follows a ``first`` event
    within ``gap``, with NO ``without`` event between them, per user.

    The negation ("no C between") — the part a plain funnel join can't
    express — costs nothing extra here: for each candidate ``second``
    event, two ``last(..., ignorenulls)`` windows over the user's
    (ts, tie)-ordered stream give the most recent preceding ``first``
    and ``without`` timestamps, and the match condition is a pure row
    filter (A exists, B - A <= gap, last C before B predates A —
    (ts, tie) lexicographic, so same-timestamp interleavings resolve
    deterministically).  ONE window shuffle total, no self-join, no
    range join; state per row is two scalars regardless of history.

    Output: user_id, first_ts, first_event, second_ts, second_event,
    wait_seconds (exact long).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def last_of(evt: str, field: str) -> Column:
        return F.last(
            F.when(F.col(type_col) == evt, F.col(field)), ignorenulls=True
        ).over(w)

    enriched = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("__type"),
        F.col(ts_col).alias("second_ts"),
        F.col(tie_col).alias("second_event"),
        last_of(first, ts_col).alias("first_ts"),
        last_of(first, tie_col).alias("first_event"),
        last_of(without, ts_col).alias("__c_ts"),
        last_of(without, tie_col).alias("__c_tie"),
    )
    a_ts, c_ts = F.col("first_ts"), F.col("__c_ts")
    no_intervening = c_ts.isNull() | (
        (c_ts < a_ts)
        | ((c_ts == a_ts) & (F.col("__c_tie") < F.col("first_event")))
    )
    return (
        enriched.filter(
            (F.col("__type") == second)
            & a_ts.isNotNull()
            & (
                F.col("second_ts")
                <= a_ts + F.expr(f"INTERVAL {gap}")
            )
            & no_intervening
        )
        .select(
            "user_id",
            "first_ts",
            F.col("first_event").cast("long").alias("first_event"),
            "second_ts",
            F.col("second_event").cast("long").alias("second_event"),
            (
                F.unix_timestamp("second_ts") - F.unix_timestamp("first_ts")
            ).cast("long").alias("wait_seconds"),
        )
    )


def active_user_counts(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Product-analytics DAU/WAU: per calendar day, the exact count of
    distinct users active that day and within the trailing
    ``window_days`` days, plus the integer-ppm stickiness ratio
    (DAU/WAU — the engagement metric product teams track daily).

    Exact (no sketch) but cheap: the corpus first collapses to the
    DISTINCT (user, day) table — at 100 TB of events this is orders of
    magnitude smaller than the raw stream — and the trailing-window
    distinct count is an explode of each user-day over the
    ``window_days`` day keys it contributes to (bounded fan-out,
    map-side) followed by one count-distinct per day.  The two
    aggregates cascade (no Expand blowup from multi-count-distinct).

    Output: d, dau, wau, stickiness_ppm.
    """
    user_days = events.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
    ).distinct()
    dau = user_days.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    contrib = user_days.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("d"),
    )
    wau = contrib.groupBy("d").agg(F.countDistinct("u").alias("wau"))
    # trailing windows extend past the last observed day; keep only
    # days that exist in the data (inner join on the DAU frame)
    return (
        dau.join(wau, "d")
        .select(
            "d",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.expr("(1000000 * dau) div wau").cast("long").alias(
                "stickiness_ppm"
            ),
        )
    )
