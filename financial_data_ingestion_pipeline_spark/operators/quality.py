"""Data-quality suite (dp:96-186): validity predicate, referential
completeness (missing tickers), and golden OHLC reconciliation.

Quirk Q5 fixed: the reference runs the missing-ticker anti-join and the
OHLC reconciliation once per *file* (per-ticker files!), flagging nearly
every symbol as missing; intent is per trading day, which is what these
compute — one distributed job per concern instead of an ``os.walk`` loop.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ohlc import daily_ohlc


def invalid_measure_predicate(measures: Sequence[str]) -> Column:
    """Row is invalid when ANY measure is NULL or negative (P6,
    dp:138-144).  The OR-of-isNull structure is preserved exactly:
    ``NULL < 0`` alone is three-valued-unknown and would drop the NULL
    rows the reference flags."""
    return reduce(or_, [F.col(c).isNull() | (F.col(c) < 0) for c in measures])


def invalid_rows(df: DataFrame, measures: Sequence[str]) -> DataFrame:
    """The invalid-values report rows (dp:138-146)."""
    return df.filter(invalid_measure_predicate(measures))


def validity_summary(
    df: DataFrame, measures: Sequence[str], group_col: str
) -> DataFrame:
    """Per-group valid/invalid counts (A7 — report sizing dp:127-129,
    175-186) as one aggregate pass instead of per-file ``.empty`` checks
    (P7)."""
    bad = invalid_measure_predicate(measures)
    return df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_invalid"),
    )


def missing_symbols(
    universe: DataFrame,
    observed: DataFrame,
    universe_key: str,
    observed_key: str,
) -> DataFrame:
    """Symbols in the golden universe with no tick data (J2,
    dp:149-153): a broadcast **left-anti join** on distinct keys —
    the distributed form of the reference's python set difference
    (dp:150), computed per day not per file (Q5)."""
    obs = observed.select(F.col(observed_key).alias("__obs_key")).distinct()
    return (
        universe.join(
            F.broadcast(obs),
            universe[universe_key] == obs["__obs_key"],
            "left_anti",
        )
    )


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """ANALYZE-style column profile: per column, row count, null count
    and fraction, exact distinct count — the health report a pipeline
    runs after every load to catch schema drift, null storms, and
    key-cardinality anomalies before they propagate.

    ONE scan: all ``3 x |cols|`` aggregates run in a single
    hash-aggregate pass (global agg -> one row), then ``stack`` unpivots
    that row to the tall (column, metric) form — the unpivot touches one
    row, so the operator costs exactly one pass over the table no
    matter how many columns are profiled.  (``count_distinct`` per
    column expands the partial agg; for very wide tables swap in the
    KMV sketch from :mod:`..functions.sketches` per column.)

    Output: ``column, n_rows, n_null, null_frac, n_distinct``.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    tall = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (column, __nn, __nd)",
    )
    return tall.select(
        F.col("column"),
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_null"),
        F.round((F.col("__n") - F.col("__nn")).cast("double") / F.col("__n"), 6).alias(
            "null_frac"
        ),
        F.col("__nd").alias("n_distinct"),
    )


def ohlc_reconciliation(
    ticks: DataFrame,
    golden: DataFrame,
    symbol_col: str = "source_symbol",
    ts_col: str = "timestamp",
    price_col: str = "ltp",
    golden_symbol_col: str = "SYMBOL",
    golden_cols: Sequence[str] = ("OPEN", "HIGH", "LOW", "CLOSE"),
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Re-aggregate ticks to daily OHLC and diff against the golden
    (bhavcopy) OHLC (dp:155-172, J1 + P11).

    The golden side is small (one row per symbol per day) -> broadcast
    hash join; diffs are plain column arithmetic.  This is the
    reference's de-facto acceptance test (SURVEY.md §5).
    """
    agg = daily_ohlc(ticks, symbol_col, ts_col, price_col, tie_cols=tie_cols)
    g = F.broadcast(golden)
    joined = agg.join(g, agg["symbol"] == g[golden_symbol_col], "inner")
    # Spark resolves column names case-insensitively by default, so the
    # golden OPEN/HIGH/LOW/CLOSE collide with the aggregate's columns —
    # every reference below must be dataframe-qualified.
    opens, highs, lows, closes = (g[c] for c in golden_cols)
    return joined.select(
        agg["symbol"].alias("symbol"),
        agg["trade_date"].alias("trade_date"),
        agg["open"].alias("open"),
        agg["high"].alias("high"),
        agg["low"].alias("low"),
        agg["close"].alias("close"),
        opens.alias("golden_open"),
        highs.alias("golden_high"),
        lows.alias("golden_low"),
        closes.alias("golden_close"),
        F.round(agg["open"] - opens, 6).alias("open_diff"),
        F.round(agg["high"] - highs, 6).alias("high_diff"),
        F.round(agg["low"] - lows, 6).alias("low_diff"),
        F.round(agg["close"] - closes, 6).alias("close_diff"),
    )


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
    block_delim: str = " ",
) -> DataFrame:
    """Entity-resolution candidate pairs: distinct values of
    ``name_col`` within ``max_dist`` edit distance of each other,
    blocked on the first token — the record-linkage step that
    canonicalizes near-identical names (misspelled tickers, vendor
    name variants) before a warehouse join.

    Scale design: the quadratic work runs on the DISTINCT-VALUE table,
    not the rows — a groupBy collapses the corpus to (name, support)
    first, and the self-join is blocked on the leading token so only
    same-block names are ever compared (swap in any cheap canopy:
    soundex, prefix, length bucket).  ``levenshtein`` is a classic DP
    every engine implements identically — integer-exact, so the pair
    set is oracle-checkable.

    Output: ``name_a, name_b, dist, n_a, n_b`` (support counts let the
    caller pick the canonical spelling by majority).
    """
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("blk", F.split(F.col("name"), block_delim)[0])
    a = names.select(
        F.col("name").alias("name_a"), F.col("n").alias("n_a"), "blk"
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("n").alias("n_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def expect_report(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
    max_violation_frac: float = 0.0,
) -> DataFrame:
    """Declarative data expectations (the Delta-Live-Tables /
    Great-Expectations pattern): each rule is a name plus a boolean
    Column; a row VIOLATES a rule unless the predicate evaluates
    exactly TRUE (NULL counts as a violation — unknown is not passing).

    ONE scan regardless of rule count: every rule compiles to a
    conditional-sum aggregate in a single hash-agg pass (map-side
    combined), and the 1-row result unpivots via ``stack`` to the tall
    report — the same cost shape as :func:`table_profile`.  Gate a
    pipeline by filtering ``passed = false``; quarantine rows by
    reusing the same predicates as row filters.

    Output: ``rule, n_rows, n_violations, violation_ppm, passed``.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).alias(f"__v_{i}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', __v_{i}" for i, (name, _) in enumerate(rules))
    tall = one.selectExpr(
        "__n", f"stack({len(rules)}, {stack_args}) AS (rule, __v)"
    )
    # ppm as exact integer floor division: engine-replayable, no float
    ppm = F.expr("(__v * 1000000) div __n").cast("long")
    return tall.select(
        "rule",
        F.col("__n").alias("n_rows"),
        F.col("__v").cast("long").alias("n_violations"),
        ppm.alias("violation_ppm"),
        (
            F.col("__v") <= F.lit(max_violation_frac) * F.col("__n")
        ).alias("passed"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int | None = 5
) -> DataFrame:
    """k-anonymity audit: every quasi-identifier equivalence class with
    fewer than ``k`` members — the groups whose rows a release would
    re-identify (the privacy gate a governance pipeline runs before
    sharing a table).

    ``k=None`` switches to the ADAPTIVE audit: flag classes strictly
    below the MEAN class size.  A fixed k certifies nothing once the
    population outgrows it (every class passes) or undershoots it
    (every class fails); below-mean is scale-free — any non-uniform
    class-size distribution yields both flagged and passing classes
    at every corpus size.  The compare is cross-multiplied exact
    integers (``n_rows * n_classes < total_rows``), never a float
    mean, so the oracle replays it bit-for-bit.

    One hash aggregate over the quasi columns; partial aggregation
    collapses each task to its distinct-combination count before the
    exchange, so the shuffle carries the class table, never rows.
    The adaptive mode adds one 1-row totals frame broadcast onto the
    class table (class-table-sized, no second pass over ``df``).
    Anti-join the output back on the quasi columns to produce the
    releasable subset, or generalize/suppress those columns and rerun.

    Output: quasi_cols..., n_rows, ordered nowhere — the class
    table is the result.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    if k is not None:
        return classes.filter(F.col("n_rows") < k)
    totals = classes.agg(
        F.count(F.lit(1)).alias("_m"), F.sum("n_rows").alias("_tot")
    )
    return (
        classes.join(F.broadcast(totals))
        .filter(F.col("n_rows") * F.col("_m") < F.col("_tot"))
        .drop("_m", "_tot")
    )
