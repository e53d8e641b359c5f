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

__all__ = ["salted_join"]


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
    """
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), n_salts)
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted_big.join(salted_small, [on, "__salt"], how)
    return joined.drop("__salt")
