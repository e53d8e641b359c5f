"""Skew-mitigation join strategies.

AQE's skew-join splitting (enabled in the session factory) handles
most hot keys by splitting oversized partitions at runtime.  The one
case it cannot fix is a SINGLE key so hot that one side's partition
exceeds what any split can balance while the OTHER side must be
replicated to meet it — the classic remedy is salting, done here as an
explicit, deterministic operator so the plan is inspectable and the
technique is testable rather than folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "pit_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's
    hot keys spread over ``n_salts`` sub-keys.

    Mechanics: every big-side row gets a deterministic salt (a hash of
    the whole row modulo ``n_salts`` — deterministic so retried tasks
    produce identical partitioning, unlike ``rand()`` which breaks
    task-retry idempotence); the small side is replicated ``n_salts``
    times via one narrow ``explode``.  The join key becomes
    ``(on, salt)``, so a key that used to land on ONE reducer now
    spreads over ``n_salts`` of them.  The salt never appears in the
    output — the result is row-identical to the plain join (tested).

    Cost model: small side pays x``n_salts`` replication (only viable
    when it is much smaller than the big side's hot-key volume — which
    is exactly the skew scenario); big side pays nothing extra.  Use
    AQE first; reach for this when one key dominates a join AQE can't
    split (e.g. a null-bucket or a monster customer).

    ``how`` is restricted to the modes where salting preserves row
    identity: ``inner``/``left``/``left_semi``/``left_anti`` (every
    big row carries exactly ONE salt, so unmatched big rows
    null-extend/survive/drop exactly once).  ``right``/``full`` are
    REJECTED: the small side is replicated per salt, so an unmatched
    small-side row would be emitted ``n_salts`` times — the classic
    silent-dup salting bug.  For those semantics swap the sides (the
    replicated side must be the one whose unmatched rows are
    discarded) or de-skew with AQE instead.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    norm = how.replace("_", "").lower()
    if norm not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join(how={how!r}): right/full joins would emit "
            f"each unmatched small-side row once per salt replica "
            f"(n_salts={n_salts} duplicates); swap the join sides or "
            f"use AQE skew handling"
        )
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), n_salts)
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted_big.join(salted_small, [on, "__salt"], how)
    return joined.drop("__salt")


def pit_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join (the feature-store lookup): each fact row
    picks the dimension version whose validity interval contains the
    fact's timestamp — ``valid_from <= ts < valid_to`` (open-ended
    current rows match everything after ``valid_from``).

    Leakage safety is structural: a fact can only ever see attribute
    versions whose ``valid_from`` is not after the fact time, so
    training features built through this join cannot peek at future
    updates — the property a plain "latest value" join silently
    violates.  SCD2 intervals partition time per key
    (:func:`..analytics.scd2_history`), so at most one version matches
    per fact; facts before any version survive with NULLs under the
    default left join (the honest "no data yet" row).

    Plan shape: an EQUI-join on the entity key with the interval
    containment as a join residual — one key-partitioned shuffle
    (broadcast when the dimension is small), never a cross join.  A
    pathologically hot entity de-skews exactly like the as-of join
    (bucket the key by coarse time range, carry interval boundaries).
    """
    if not key_cols:
        raise ValueError("pit_join requires at least one key column")
    overlap = (set(facts.columns) & set(dim_history.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            f"facts and dim_history share non-key columns {sorted(overlap)}; "
            "rename one side or the joined frame would carry duplicate names"
        )
    f = facts.alias("f")
    d = dim_history.alias("d")
    key_eq = [f[c] == d[c] for c in key_cols]
    in_interval = (d[valid_from_col] <= f[ts_col]) & (
        d[valid_to_col].isNull() | (f[ts_col] < d[valid_to_col])
    )
    cond = key_eq[0]
    for k in key_eq[1:]:
        cond = cond & k
    joined = f.join(d, cond & in_interval, how)
    dim_cols = [
        c
        for c in dim_history.columns
        if c not in set(key_cols)
    ]
    return joined.select(
        *[f[c] for c in facts.columns],
        *[d[c] for c in dim_cols],
    )
