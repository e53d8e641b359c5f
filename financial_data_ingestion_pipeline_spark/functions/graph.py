"""Graph analytics over edge DataFrames.

Connected components (near-dup clustering) lives in
``functions/dedup.py::neardup_clusters``; this module holds the other
iterative classic — PageRank — in a form a 100 TB engine can actually
run AND an external engine can replay bit-for-bit.

Why integer PageRank: float PageRank sums in-neighbor contributions,
and float addition is not associative — a shuffle reorder changes the
last ulp, so no cross-engine (or even cross-run) hash can match.  Here
ranks are INTEGER units (10^12 per node), contributions are floor
divisions, and the damping step is integer cross-multiplication —
every iteration is exact, associative, and engine-portable.  The
floor-rounding bias is ~deg/10^12 per node per iteration: irrelevant
for ranking, priceless for verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "item_a",
    dst_col: str = "item_b",
) -> DataFrame:
    """Fixed-iteration integer PageRank over an UNDIRECTED edge list.

    Every node starts at ``SCALE`` units; each iteration a node splits
    ``rank // degree`` units to every neighbor and the new rank is
    ``(100-d)% * SCALE + d% * incoming`` — all in integer floor
    arithmetic (see module docstring for why).

    Plan shape: the directed edge table (each undirected edge twice)
    is materialized ONCE with ``localCheckpoint`` — without it every
    iteration would re-derive the whole upstream edge pipeline (e.g. a
    co-purchase self-join) once per reference, and lineage would grow
    with the iteration count (same loop discipline as
    ``dedup.neardup_clusters``).  Each iteration is then ONE equi-join
    of the current (node, rank) table against the edges plus ONE
    sum-aggregate on the destination — both hash-partition on the node
    key; rounds are bounded (``iters``), state is one long per node.
    No collect, no driver loop data dependence.

    Output: ``node, rank`` (integer units; divide by SCALE for the
    conventional number).
    """
    fwd = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    rev = edges.select(
        F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
    )
    directed = fwd.unionByName(rev)
    degrees = directed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) materialized once: the degree join leaves the
    # loop entirely, so an iteration is exactly one join + one agg
    edges_deg = directed.join(degrees, "src").select(
        "src", "dst", "deg"
    ).localCheckpoint(eager=True)
    degrees = edges_deg.select("src", "deg").distinct().localCheckpoint(
        eager=True
    )
    ranks = degrees.select(
        F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank")
    )
    base = ((100 - damping_pct) * SCALE) // 100
    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("rank div deg").alias("_c"),
            )
        )
        incoming = contrib.groupBy("dst").agg(F.sum("_c").alias("_in"))
        ranks = degrees.join(
            incoming, degrees["src"] == incoming["dst"], "left_outer"
        ).select(
            F.col("src").alias("node"),
            (
                F.lit(base).cast("long")
                + F.expr(
                    f"({damping_pct} * coalesce(_in, 0L)) div 100"
                )
            ).cast("long").alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks
