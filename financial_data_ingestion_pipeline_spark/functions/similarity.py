"""Similarity search over embedding columns (``array<float>``).

Two paths:

- :func:`cosine_topk` — exact brute-force k-NN.  The query set is
  broadcast, so scoring is map-side over the (huge) corpus with no
  shuffle; only the per-query top-k ranking shuffles, keyed by query
  id.  This is the correctness baseline.
- :func:`ann_lsh_topk` — banded random-hyperplane LSH: ``num_tables``
  independent hash tables, each keyed by ``planes_per_table`` sign
  bits.  A vector lands in one bucket per table; candidates for a
  query are vectors sharing ANY table's bucket, then exact cosine
  re-ranks the candidates.  Banding trades collision probability
  against candidate volume: P(candidate) = 1-(1-p^b)^L where
  p = 1 - theta/pi — raise b and L together at scale for high recall
  at low candidate rates.  The bucket join replaces the full scan:
  at 100 TB, per-query work drops from O(N) to O(candidates) with one
  shuffle keyed by (table, bucket).

All math is plain Column expressions (``zip_with`` / ``aggregate``
with literal coefficient arrays), so cosine values are deterministic
and reproducible bit-for-bit in an external oracle.  Similarities are
rounded to 6 dp *before* ranking, with the neighbor id as tie-break,
so top-k sets are stable across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqnorm(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(_dot(a, b) / F.sqrt(_sqnorm(a) * _sqnorm(b)), decimals)


def cosine_with_norms(
    a: Column, b: Column, sq_a: Column, sq_b: Column, decimals: int = 6
) -> Column:
    """Cosine with precomputed squared norms — same arithmetic shape as
    :func:`cosine` (``dot / sqrt(sq_a * sq_b)``, bit-identical), but the
    norms are computed once per *vector* instead of once per *pair*:
    per-pair work drops from three 64-element folds to one."""
    return F.round(_dot(a, b) / F.sqrt(sq_a * sq_b), decimals)


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Queries are a broadcast dimension; candidate scoring is map-side.
    Output: (query_id, neighbor_id, rank, sim).
    """
    q = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _sqnorm(F.col(vec_col)).alias("q_sq"),
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _sqnorm(F.col(vec_col)).alias("c_sq"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_sq"), F.col("c_sq")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _plane_coeffs(num_planes: int, dim: int, seed: str) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane coefficients in
    [-1000, 1000], derived from md5 in the *driver* — they enter the
    plan as literal arrays (tiny, constant-folded) instead of per-row
    hash expressions, and any external engine can regenerate them."""
    planes = []
    for p in range(num_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:15], 16)
            row.append(float(h % 2001 - 1000))
        planes.append(row)
    return planes


def _plane_bits(
    vec_col: Column, num_planes: int, dim: int, seed: str = "hp"
) -> list[Column]:
    """Sign bit per hyperplane: bit p = 1 iff dot(vec, plane_p) > 0.
    Each dot is a fold over ``zip_with(vec, literal_coeffs)`` — one
    pass per plane, all inside codegen."""
    bits = []
    for coeffs in _plane_coeffs(num_planes, dim, seed):
        plane = F.array(*[F.lit(c) for c in coeffs])
        bits.append(F.when(_dot(vec_col, plane) > 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def hyperplane_signature(
    vec_col: Column, num_planes: int = 16, dim: int = 64, seed: str = "hp"
) -> Column:
    """``num_planes``-bit signature packed into a long (bit p set iff
    ``dot(vec, plane_p) > 0``)."""
    bits = _plane_bits(vec_col, num_planes, dim, seed)
    sig = F.lit(0).cast("long")
    for p, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(2**p).cast("long"))
    return sig


def _banded_buckets(
    vec_col: Column,
    planes_per_table: int,
    num_tables: int,
    dim: int,
    seed: str = "hp",
) -> Column:
    """Array of ``num_tables`` bucket keys; table t's key packs its
    ``planes_per_table`` sign bits, offset by the table index so
    buckets never collide across tables."""
    bits = _plane_bits(vec_col, planes_per_table * num_tables, dim, seed)
    buckets = []
    for t in range(num_tables):
        key = F.lit(t * (2**planes_per_table)).cast("long")
        for j in range(planes_per_table):
            key = key + bits[t * planes_per_table + j].cast("long") * F.lit(2**j).cast("long")
        buckets.append(key)
    return F.array(*buckets)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    planes_per_table: int = 2,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via banded multi-table LSH: candidates share
    at least one of ``num_tables`` per-table buckets with the query,
    exact cosine re-ranks.

    Defaults (b=2, L=8) are tuned for near-uniform fixture vectors —
    high recall at a high candidate rate.  At 100 TB with clustered
    real embeddings, raise both (e.g. b=16, L=8) so the candidate set
    stays tiny while recall holds.  Output: (query_id, neighbor_id,
    rank, sim) — recall vs :func:`cosine_topk` is gated in tests; the
    driver records a rows-only check (approximate results are not
    SQL-oracle-expressible).
    """
    buckets = _banded_buckets(F.col(vec_col), planes_per_table, num_tables, dim)
    # narrow posting table: (id, bucket) only — the 64-dim vectors are
    # joined back AFTER candidate dedup, so they never ride the bucket
    # shuffle (at 100 TB the posting join would otherwise replicate
    # every vector once per bucket collision)
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.explode(buckets).alias("bucket")
    )
    queries = base.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("bucket")
    )
    pair_ids = (
        F.broadcast(queries)
        .join(base, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_vecs = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _sqnorm(F.col(vec_col)).alias("q_sq"),
        )
    )
    c_vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _sqnorm(F.col(vec_col)).alias("c_sq"),
    )
    cands = (
        pair_ids.join(q_vecs, "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn(
            "sim",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_sq"), F.col("c_sq")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _lit_vec(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def _nearest_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Index of the highest-cosine centroid (ties -> highest index).
    One dot fold per centroid, all map-side; centroids enter the plan
    as literals so the assignment is a pure projection."""
    scored = [
        F.named_struct(
            F.lit("s"), cosine(vec_col, _lit_vec(c)), F.lit("cell"), F.lit(i)
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_max(F.array(*scored))["cell"]


def _probe_cells(
    vec_col: Column, centroids: list[list[float]], n_probe: int
) -> Column:
    """Array of the ``n_probe`` highest-cosine centroid indices."""
    scored = [
        F.named_struct(
            F.lit("s"), cosine(vec_col, _lit_vec(c)), F.lit("cell"), F.lit(i)
        )
        for i, c in enumerate(centroids)
    ]
    top = F.slice(F.reverse(F.array_sort(F.array(*scored))), 1, n_probe)
    return F.transform(top, lambda x: x["cell"])


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """IVF coarse quantizer: stride-sampled seeds + ``refine_iters``
    distributed Lloyd iterations.

    Each iteration is (a) a map-side nearest-centroid assignment and
    (b) one groupBy(cell, dim) mean over the posexploded components —
    only ``n_cells x dim`` aggregates ever reach the driver, so training
    cost is O(passes over corpus), independent of corpus size in driver
    memory.  Empty cells keep their previous centroid.
    """
    n = embeddings.count()
    stride = max(1, n // n_cells)
    seeds = (
        embeddings.filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(refine_iters):
        assigned = embeddings.select(
            _nearest_cell(F.col(vec_col), centroids).alias("cell"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {c: list(cent) for c, cent in enumerate(centroids)}
        for r in means:
            new[r.cell][r.pos] = float(r.m)
        centroids = [new[c] for c in range(len(centroids))]
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF-flat: corpus vectors are binned to
    their nearest coarse centroid; each query scans only its ``n_probe``
    closest cells, exact cosine re-ranks the candidates.

    The scale path next to :func:`ann_lsh_topk`: per-query work drops
    from O(N) to O(N * n_probe / n_cells), the inverted lists are an
    equi-join key (no range/cross join), and the quantizer trains in
    ``refine_iters`` distributed passes.  Approximate -> rows-only
    driver check; recall vs :func:`cosine_topk` is gated in tests.
    """
    centroids = train_ivf_centroids(
        embeddings, n_cells, refine_iters, id_col, vec_col
    )
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _sqnorm(F.col(vec_col)).alias("c_sq"),
        _nearest_cell(F.col(vec_col), centroids).alias("cell"),
    )
    queries = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _sqnorm(F.col(vec_col)).alias("q_sq"),
            F.explode(
                _probe_cells(F.col(vec_col), centroids, n_probe)
            ).alias("cell"),
        )
    )
    cands = (
        queries.join(base, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_sq"), F.col("c_sq")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_table: int = 4,
    num_tables: int = 4,
    dim: int = 64,
    exact: bool = False,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).

    ``exact=True`` scores all pairs — quadratic, so pass ``block_col``
    (e.g. a cluster/label/shard key) to confine the self-join to blocks;
    oracle-checkable.  Default is the banded-LSH path: pairs must share
    a bucket in at least one table, which at a high threshold has
    near-total recall since near-identical vectors agree on almost
    every hyperplane."""
    sel = lambda suf: [  # noqa: E731
        F.col(id_col).alias(f"id_{suf}"),
        F.col(vec_col).alias(f"vec_{suf}"),
        _sqnorm(F.col(vec_col)).alias(f"sq_{suf}"),
    ] + ([F.col(block_col).alias(f"blk_{suf}")] if block_col else [])
    a = embeddings.select(*sel("a"))
    b = embeddings.select(*sel("b"))
    if exact:
        if block_col:
            pairs = a.join(b, F.col("blk_a") == F.col("blk_b")).filter(
                F.col("id_a") < F.col("id_b")
            )
        else:
            pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        buckets = _banded_buckets(F.col(vec_col), planes_per_table, num_tables, dim)
        # narrow (id, bucket) posting join; vectors join back post-dedup
        withsig = embeddings.select(
            F.col(id_col).alias("doc"), F.explode(buckets).alias("bucket")
        )
        pair_ids = (
            withsig.select(F.col("doc").alias("id_a"), "bucket")
            .join(withsig.select(F.col("doc").alias("id_b"), "bucket"), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = pair_ids.join(embeddings.select(*sel("a")), "id_a").join(
            embeddings.select(*sel("b")), "id_b"
        )
    return (
        pairs.withColumn(
            "sim",
            cosine_with_norms(
                F.col("vec_a"), F.col("vec_b"), F.col("sq_a"), F.col("sq_b")
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
