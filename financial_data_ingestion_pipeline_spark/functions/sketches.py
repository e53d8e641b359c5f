"""Mergeable sketches for approximate analytics at 100-TB scale.

The value of a sketch in Spark is its AGGREGATION SHAPE: constant-size
partial state that combines associatively, so the whole estimate runs
as one map-side-combined ``groupBy`` with no second pass and no big
state — the same shuffle profile as a ``count(*)``.

Spark's built-in ``approx_count_distinct`` (HLL++) has that shape but
its estimate is engine-internal — no other engine reproduces the exact
number, so it can't be oracle-checked.  :func:`approx_distinct_kmv`
instead uses the K-minimum-values idea with ``k`` portable hash lanes
(three disjoint 40-bit windows per md5 digest — see
:func:`kmv_digest_cols`): the partial state is
``k`` doubles (one running MIN per lane), merging is element-wise MIN
(exactly what Spark's partial aggregation does for ``F.min``), and the
estimator is a deterministic closed form any engine recomputes from the
same rows — DuckDB replays it bit-for-bit.

Estimator: for n distinct values, each hash's minimum fraction m_i has
E[m_i] = 1/(n+1), so n_hat = k / sum(m_i) - 1 with relative error
~1/sqrt(k).  Duplicates cost nothing: MIN over repeated values equals
MIN over the distinct set, so no pre-distinct shuffle is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_ingestion_pipeline_spark.functions.text import hash64
from financial_data_ingestion_pipeline_spark.session import fan_out

_HASH_SPACE = float(1 << 40)  # lane hashes are uniform on [0, 2^40)
_LANE_STARTS = (1, 11, 21)  # three disjoint 10-hex-char windows per digest
_LANE_WIDTH = 10


def kmv_digest_cols(value_expr: str, k: int) -> list[Column]:
    """``ceil(k/3)`` md5 digest columns — each 128-bit digest carries
    three INDEPENDENT disjoint 40-bit lanes (hex chars 1-10, 11-20,
    21-30), so ``k`` lanes cost ``k/3`` hash chains.  40 bits is ample
    lane resolution: E[min] = 1/(n+1), so discretization bias appears
    only near n ~ 2^40 distinct values PER GROUP — far beyond any
    per-group cardinality the estimator's ~1/sqrt(k) error is useful
    for.  Lane independence is what keeps the nonlinear ``k/sum(min)``
    estimator unbiased (a cheaper double-hashing expansion correlates
    the lanes and inflates the estimate ~2x — measured); disjoint
    substrings of one digest stay independent.  Hoist these into a
    projection: Spark does not share common subexpressions across
    separate aggregate update expressions, so hashing inside
    ``min(...)`` would evaluate every digest twice.

    Takes a SQL snippet, not a Column: the digest/lane expressions are
    assembled as strings and parsed in ONE ``F.expr`` round-trip each —
    the equivalent Column-method chains cost ~1 ms of py4j latency PER
    METHOD CALL of driver-side fixed cost on every fresh plan (see
    ``dedup.simhash``; kmv_distinct measured 2.4 s of pure plan
    construction at k=32 before the change)."""
    n_lanes = len(_LANE_STARTS)
    return [
        F.expr(f"md5(concat('kmv{j}:', {value_expr}))").alias(f"__kmv_d{j}")
        for j in range((k + n_lanes - 1) // n_lanes)
    ]


def _kmv_lane_mins(k: int, prefix: str = "m") -> list[Column]:
    """The k ``min(substring(digest, lane))`` aggregates over the
    digest columns of :func:`kmv_digest_cols`, as parsed-string
    expressions (same fixed-cost rationale as above)."""
    aggs: list[Column] = []
    i = 0
    for j in range((k + len(_LANE_STARTS) - 1) // len(_LANE_STARTS)):
        for start in _LANE_STARTS:
            if i < k:
                aggs.append(
                    F.expr(
                        f"min(substring(__kmv_d{j}, {start}, {_LANE_WIDTH}))"
                    ).alias(f"{prefix}{i}")
                )
                i += 1
    return aggs


def approx_distinct_kmv(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` with the
    k-mins sketch, next to the exact count for accuracy inspection.

    The lane minima depend only on the DISTINCT ``(group, value)``
    pairs — duplicates can never lower a min — and the exact
    ``count_distinct`` forces Spark to shuffle exactly that distinct
    set anyway (the two-phase distinct-aggregate rewrite).  So the
    digest projection runs AFTER the dedup (round-11, guide §1.2):
    same two exchanges as before, but the md5 chain is evaluated once
    per distinct pair instead of once per input row — on event streams
    the duplication factor is the whole point of the sketch, so this
    is the dominant CPU term.  The estimate sums the k minima in fixed
    index order (a left-to-right chain, deterministic in any engine)
    and rounds to 6 dp.

    Output: group cols, ``n_distinct_exact``, ``n_distinct_est``.
    """
    distinct_pairs = (
        fan_out(df).select(*group_cols, value_col).distinct()
    )
    with_digests = distinct_pairs.select(
        *group_cols,
        value_col,
        *kmv_digest_cols(f"cast(`{value_col}` as string)", k),
    )
    # minima are taken over fixed-width lowercase HEX substrings — they
    # order identically to their numeric value (same trick as
    # ``dedup.minhash_signatures``), so the per-row path is md5 +
    # substring only; the hex->number conv and the IEEE division run
    # once per FINAL minimum (k per group), not once per row.
    # count(value) over the distinct frame == the old count_distinct
    # (both skip NULL values; a group whose values are all NULL still
    # surfaces through its (group, NULL) distinct row, exact = 0).
    agg = with_digests.groupBy(*group_cols).agg(
        F.count(F.col(value_col)).alias("n_distinct_exact"),
        *_kmv_lane_mins(k),
    )
    # one parsed string for the whole estimate: the lane fractions sum
    # left-to-right (SQL + is left-associative — identical IEEE order
    # to the old Column fold), one divide per lane, k/total - 1.0
    total = " + ".join(
        f"cast(conv(m{i}, 16, 10) as bigint) / {_HASH_SPACE!r}D"
        for i in range(k)
    )
    est = F.expr(f"round(cast({k} as double) / ({total}) - 1.0D, 6)")
    return agg.select(
        *group_cols,
        "n_distinct_exact",
        est.alias("n_distinct_est"),
    )


def cm_buckets(term_col: Column, width: int, depth: int) -> Column:
    """``array<struct<lane,bucket>>`` — the Count-Min lane/bucket pairs
    for one term.  Shared by the batch sketch, the estimator, and the
    streaming counter aggregation so all three hash identically (and
    identically to the md5 replay an external oracle runs)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("lane"),
                (
                    hash64(F.concat(F.lit(f"cm{j}:"), term_col.cast("string")))
                    % width
                ).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def countmin_sketch(
    occ: DataFrame,
    term_col: str = "term",
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """Count-Min frequency sketch over a term-occurrence stream — the
    bounded-memory counterpart of an exact ``groupBy(term).count()``:
    state is ``depth x width`` counters NO MATTER how large the
    vocabulary, so the shuffle carries at most ``depth x width`` rows
    per partition (map-side combined) instead of one row per distinct
    term.  Point estimates overcount by at most ``e/width x total``
    with probability ``1 - e^-depth`` (the classic CM bound) and NEVER
    undercount.

    Lanes hash with the same portable md5 scheme as the KMV sketch, so
    any engine rebuilds the identical counter table — oracle-checkable
    bit-for-bit, unlike engine-internal frequent-item sketches.

    Output: ``lane, bucket, cnt`` (the mergeable sketch table —
    element-wise SUM merges two sketches).
    """
    lanes = F.explode(cm_buckets(F.col(term_col), width, depth))
    return (
        occ.select(lanes.alias("lb"))
        .select("lb.lane", "lb.bucket")
        .groupBy("lane", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_sketch_from_counts(
    counts: DataFrame,
    term_col: str = "term",
    count_col: str = "cnt",
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """:func:`countmin_sketch` built from an ALREADY-AGGREGATED
    ``(term, count)`` table: each cell sums the counts of the terms
    hashing into it — identical counters by commutativity (the sum
    over occurrences equals the count-weighted sum over distinct
    terms).  Callers that compute exact term counts anyway
    (``heavy_hitters``) get the sketch for the cost of hashing each
    DISTINCT term once instead of re-scanning the corpus and hashing
    every occurrence ``depth``/2 md5s deep — at 100 TB that is the
    difference between vocabulary-sized and corpus-sized hashing
    (guide §1.2: don't compute things twice).

    Output: ``lane, bucket, cnt`` — same mergeable sketch table.
    """
    lanes = F.explode(cm_buckets(F.col(term_col), width, depth))
    return (
        counts.select(F.col(count_col).alias("__c"), lanes.alias("lb"))
        .select("lb.lane", "lb.bucket", "__c")
        .groupBy("lane", "bucket")
        .agg(F.sum("__c").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    term_col: str = "term",
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a :func:`countmin_sketch` table:
    for each item, ``min`` over its ``depth`` lane buckets.  The sketch
    is at most ``depth x width`` rows, so it broadcasts and estimation
    is a map-side join however many items are probed.

    Output: the item rows plus ``n_est``.
    """
    probes = (
        items.select(
            "*", F.explode(cm_buckets(F.col(term_col), width, depth)).alias("lb")
        )
        .select("*", "lb.lane", "lb.bucket")
        .drop("lb")
    )
    others = [c for c in items.columns]
    return (
        probes.join(F.broadcast(sketch), ["lane", "bucket"])
        .groupBy(*others)
        .agg(F.min("cnt").alias("n_est"))
    )


def approx_quantile_hist(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Per-group approximate quantiles from a fixed equi-width histogram
    over ``[lo, hi)`` — the mergeable-quantile counterpart of
    :func:`approx_distinct_kmv`.

    Aggregation shape is the whole point: the sketch state is
    ``n_bins`` counters per group, built by ONE map-side-combined
    ``groupBy(group, bin)`` count — the same shuffle profile as a
    ``count(*)`` rollup, no sorting, no per-group value lists.
    Everything after the agg (cumulative counts, quantile targets,
    linear interpolation inside the landing bin) runs on
    ``groups x n_bins`` rows — post-shuffle dust at any corpus size.
    Unlike ``percentile_approx``'s engine-internal GK/KLL state, the
    histogram estimator is a closed form any engine replays exactly,
    so it is DuckDB-oracle-checkable bit for bit (all arithmetic is
    IEEE doubles in the same order).

    Values outside ``[lo, hi)`` clamp into the edge bins; the estimate
    for quantile ``q`` targets rank ``q * n`` and interpolates within
    the first bin whose cumulative count reaches it.

    Output: group cols, ``q``, ``n``, ``est``.
    """
    binned = (
        df.select(*group_cols, hist_bin(value_col, lo, hi, n_bins).alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return hist_quantiles(binned, group_cols, quantiles, lo, hi, n_bins)


def hist_bin(value_col: Column | str, lo: float, hi: float, n_bins: int) -> Column:
    """Equi-width bin index over ``[lo, hi)`` with edge clamping — the
    per-row half of the histogram sketch, shared by the batch operator
    and the streaming counter aggregation."""
    width = (hi - lo) / n_bins
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    )


def hist_quantiles(
    binned: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Finalize histogram counters (``group cols, _bin, _cnt``) into
    quantile estimates — the read-time half of the sketch.  Runs on
    ``groups x n_bins`` rows, so it's free to call on a materialized
    sketch table however often the dashboard polls."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    wg = Window.partitionBy(*group_cols).orderBy("_bin")
    cum = binned.select(
        *group_cols,
        "_bin",
        "_cnt",
        F.sum("_cnt").over(wg.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
        F.sum("_cnt").over(
            Window.partitionBy(*group_cols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    expanded = cum.select(*group_cols, "_bin", "_cnt", "_cum", "n", qs)
    target = F.col("q") * F.col("n").cast("double")
    hit = expanded.filter(F.col("_cum").cast("double") >= target)
    first = Window.partitionBy(*group_cols, "q").orderBy("_bin")
    picked = hit.withColumn("_rn", F.row_number().over(first)).filter(
        F.col("_rn") == 1
    )
    frac = (target - (F.col("_cum") - F.col("_cnt")).cast("double")) / F.col(
        "_cnt"
    ).cast("double")
    est = F.lit(lo) + F.lit(width) * (F.col("_bin").cast("double") + frac)
    return picked.select(*group_cols, "q", "n", est.alias("est"))


# --------------------------------------------------------------------------
# Bloom filter: mergeable bit-array membership sketch
# --------------------------------------------------------------------------

BLOOM_WORD_BITS = 32  # bits per word; masks stay far from BIGINT sign


def _bloom_positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of ``k`` bit positions for a key — independent md5 chains
    (``bloom{j}:`` prefixes), engine-portable like every hash here."""
    s = F.coalesce(key.cast("string"), F.lit(""))
    return F.array(
        *[
            (hash64(F.concat(F.lit(f"bloom{j}:"), s)) % m_bits)
            for j in range(k_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a SPARSE word table
    ``(word, bits)`` — only words with at least one set bit exist.

    Aggregation shape: explode each key's ``k`` positions (narrow),
    then ONE ``groupBy(word)`` with a ``bit_or`` partial aggregate —
    constant state per word, map-side combined, merge-associative.
    Two filters union by ``unionByName`` + the same groupBy; the dense
    m/32-word array never materializes anywhere.

    Membership is one-sided, the property that makes Bloom the
    standard pre-filter for ingest-time dedup: a clean miss is
    DEFINITELY new; a hit is only maybe-seen and goes to the exact
    check.  False-positive rate ~ (1 - e^(-k*n/m))^k.
    """
    pos = F.explode(
        _bloom_positions(F.col(key_col), m_bits, k_hashes)
    ).alias("_p")
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p % {BLOOM_WORD_BITS} AS INT))")
    return (
        df.select(pos)
        .select(
            (F.col("_p") / BLOOM_WORD_BITS).cast("long").alias("word"),
            mask.alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe a :func:`bloom_build` table: ``id, n_hits, maybe_seen``
    (``maybe_seen = 1`` iff all ``k`` probed bits are set).

    The probe is a narrow explode to ``(id, word, mask)`` postings, an
    equi-join against the sparse word table (broadcast when the filter
    is small — m/32 words max), and one per-id count — the probed
    payload never rides a shuffle."""
    pos = F.posexplode(
        _bloom_positions(F.col(key_col), m_bits, k_hashes)
    )
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(col % {BLOOM_WORD_BITS} AS INT))"
    )
    postings = df.select(F.col(id_col), pos).select(
        id_col,
        F.col("pos"),
        (F.col("col") / BLOOM_WORD_BITS).cast("long").alias("word"),
        mask.alias("_mask"),
    )
    hit = (
        postings.join(F.broadcast(bloom), "word")
        .filter(F.col("bits").bitwiseAND(F.col("_mask")) == F.col("_mask"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        df.select(id_col)
        .join(hit, id_col, "left_outer")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.when(F.coalesce(F.col("n_hits"), F.lit(0)) == k_hashes, 1)
            .otherwise(0)
            .cast("long")
            .alias("maybe_seen"),
        )
    )


def range_bucket_assign(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 8,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 64,
) -> DataFrame:
    """Balanced range partitioning from the histogram sketch — the
    write-layout operator: assign every row a bucket such that buckets
    are value-contiguous (range pruning works on the output files) AND
    row counts are balanced to within one histogram bin's population,
    WITHOUT a global sort.  This is what sizes output partitions for a
    100 TB write when the value distribution is skewed: Spark's own
    ``repartitionByRange`` samples non-deterministically; this sketch
    route is reproducible and engine-replayable.

    Exact integer rule: a row in histogram bin ``b`` lands in bucket
    ``(cum_count_before_b * n_buckets) div total`` — monotone in the
    bin index (so buckets are contiguous ranges) and balanced because
    consecutive cumulative ranks split evenly.  One map-side-combined
    bin count, a 64-row cumulative window, and a broadcast bin->bucket
    map back over the scan: the data itself shuffles zero times.

    Output: the input columns plus ``_bin`` and ``bucket``.
    """
    from pyspark.sql import Window

    binned = df.withColumn("_bin", hist_bin(value_col, lo, hi, n_bins))
    counts = binned.groupBy("_bin").agg(F.count(F.lit(1)).alias("_cnt"))
    # bounded: global window over the n_bins-row histogram counter frame
    w = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    total = counts.agg(F.sum("_cnt").alias("_total"))
    buckets = (
        counts.withColumn(
            "_before", F.coalesce(F.sum("_cnt").over(w), F.lit(0))
        )
        .crossJoin(F.broadcast(total))
        .select(
            "_bin",
            F.expr(f"(_before * {n_buckets}) div _total")
            .cast("long")
            .alias("bucket"),
        )
    )
    return binned.join(F.broadcast(buckets), "_bin")


def kmv_overlap(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 32,
) -> DataFrame:
    """Set-overlap estimation WITHOUT a join: KMV sketches of two key
    columns plus the union sketch (element-wise lane MIN over both
    sides), combined by inclusion-exclusion — the cardinality
    diagnostic a planner (or a data engineer sizing a join) wants
    before paying for the join itself.  One shuffle-free-per-side
    union + ONE aggregation pass with 3k lane minima; every estimate
    is the same closed form as :func:`approx_distinct_kmv`, so an
    external engine replays all four numbers bit-for-bit.

    Output (one row): ``n_a_est, n_b_est, union_est, inter_est``.

    The union sketch costs nothing extra: the union's lane minimum is
    ``least(min_a, min_b)`` of the two per-side minima, so each side
    is aggregated independently (two narrow scans, no union shuffle,
    no conditional aggregates) and the 1-row frames cross-join.
    """

    def side_mins(df: DataFrame, col: str, prefix: str) -> DataFrame:
        with_digests = fan_out(df.select(col)).select(
            *kmv_digest_cols(f"cast(`{col}` as string)", k)
        )
        return with_digests.agg(*_kmv_lane_mins(k, prefix))

    agg = side_mins(df_a, col_a, "a").crossJoin(
        F.broadcast(side_mins(df_b, col_b, "b"))
    )

    # Final estimates from the 2k lane minima.  As Column expressions
    # this is a ~100-node tree (k conv+divide terms per estimate,
    # three estimates) whose per-call ANALYSIS cost dwarfs executing it
    # over ONE row — the same fixed-cost profile as the simhash
    # majority decode, fixed the same way: one Arrow UDF with the
    # identical arithmetic.  Exactness is preserved operation for
    # operation: hex -> exact integer -> one divide per lane, lane
    # fractions summed in ascending index order (left-to-right fold),
    # k/total - 1.0, then HALF_UP 6-dp rounding (floor(x*1e6 + 0.5) —
    # what Spark's round and DuckDB's round both do for positive x).
    @F.pandas_udf(
        "struct<n_a_est:double,n_b_est:double,union_est:double,inter_est:double>"
    )
    def _estimates(a_mins, b_mins):
        import math

        import pandas as pd

        def est(hexes):
            # an empty input side aggregates min() over zero rows ->
            # NULL lane minima; propagate NULL like the Column form did
            if any(h is None for h in hexes):
                return None
            total = 0.0
            for h in hexes:
                total = total + (int(h, 16) / _HASH_SPACE)
            return math.floor((float(k) / total - 1.0) * 1e6 + 0.5) / 1e6

        out = []
        for av, bv in zip(a_mins, b_mins):
            n_a = est(av)
            n_b = est(bv)
            union = est(
                [None if (x is None or y is None) else min(x, y)
                 for x, y in zip(av, bv)]
            )
            if n_a is None or n_b is None or union is None:
                inter = None
            else:
                inter = max(
                    0.0, math.floor((n_a + n_b - union) * 1e6 + 0.5) / 1e6
                )
            out.append(
                {"n_a_est": n_a, "n_b_est": n_b,
                 "union_est": union, "inter_est": inter}
            )
        return pd.DataFrame(out)

    return agg.select(
        _estimates(
            F.array(*[F.col(f"a{i}") for i in range(k)]),
            F.array(*[F.col(f"b{i}") for i in range(k)]),
        ).alias("_e")
    ).select("_e.n_a_est", "_e.n_b_est", "_e.union_est", "_e.inter_est")
