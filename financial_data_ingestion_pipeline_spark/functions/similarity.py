"""Similarity search over embedding columns (``array<float>``).

Three paths:

- :func:`cosine_topk` — exact brute-force k-NN.  The query set is
  broadcast, so scoring is map-side over the (huge) corpus with no
  shuffle; only the per-query top-k ranking shuffles, keyed by query
  id.  This is the correctness baseline.
- :func:`ann_lsh_topk` — multiprobe random-hyperplane LSH over a
  SHARED plane set: ``num_planes`` sign bits are computed once per
  vector (one literal-matrix pass), and each of ``num_tables`` hash
  tables keys on a different ``bits_per_table``-subset of those bits.
  Queries additionally probe every bucket within hamming distance
  ``multiprobe`` of their own key (standard multiprobe LSH), which
  buys recall without adding tables.  Candidates re-rank by exact
  cosine.
- :func:`ivf_topk` — IVF-flat: corpus vectors are binned to their
  nearest coarse centroid (one equi-join key), queries scan their
  ``n_probe`` closest cells.  The quantizer either trains in
  ``refine_iters`` distributed Lloyd passes or is supplied pretrained
  (:data:`ivf_pretrained.CENTROIDS`) — the production pattern, where
  the index is built once and reused across queries.

Expression-cost design (this is what makes the module fast):

- Literal vectors/matrices enter the plan through ONE parsed SQL
  string (:func:`_lit_matrix`) instead of thousands of per-element
  ``F.lit`` py4j calls — plan construction is O(1) round-trips.
- Every squared norm is computed once: per corpus row as a hoisted
  ``__sq`` column, per centroid/plane in the DRIVER (they are Python
  literals) — a candidate score is a single 64-element dot fold, not
  three.
- All per-centroid / per-plane scores come from one higher-order
  ``zip_with`` over the literal matrix, so the expression tree stays
  small no matter how many centroids there are.

Determinism contract (what makes every path oracle-checkable): plane
coefficients are whole numbers and embeddings are float32, so each
product in a hyperplane dot is EXACT in double precision — the only
rounding is the sequential accumulation, which any engine that folds
left-to-right reproduces bit-for-bit.  Similarities are rounded to
6 dp *before* ranking with the neighbor id as tie-break, and centroid
assignment breaks score ties toward the higher cell index, so
candidate sets and top-k sets are stable across engines.

Scale caveat, measured: on an isotropic corpus (the synthetic fixture
is one — top-5 neighbor cosine ~0.35 vs ~0.0 for random pairs) NO
sublinear ANN exists; recall 0.9 costs a ~0.65 candidate rate here.
On clustered real embeddings the same defaults prune hard (recall
1.0 at ~6% candidates on a 4000-vector 20-cluster benchmark — see
``tests/test_functions.py::test_ann_prunes_on_clustered_data``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SQ = "__sq"  # hoisted squared-norm column name


# ---------------------------------------------------------------------------
# literal plumbing
# ---------------------------------------------------------------------------

def _sql_double(v: float) -> str:
    """Shortest exact SQL double literal (``repr`` round-trips; the
    ``D`` suffix forces DOUBLE, since a bare ``1.5`` parses as
    DECIMAL in Spark SQL)."""
    return repr(float(v)) + "D"


def _lit_vec(values: list[float]) -> Column:
    """Literal array<double> built from ONE parsed expression string —
    ~1000x fewer py4j round-trips than ``F.array(*map(F.lit, ...))``."""
    return F.expr("array(" + ",".join(_sql_double(v) for v in values) + ")")


def _lit_matrix(rows: list[list[float]]) -> Column:
    """Literal array<array<double>> from one parsed expression string."""
    inner = (
        "array(" + ",".join(_sql_double(v) for v in row) + ")" for row in rows
    )
    return F.expr("array(" + ",".join(inner) + ")")


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


def _py_sqnorm(vec: list[float]) -> float:
    """Driver-side squared norm with the SAME sequential fold order as
    :func:`_sqnorm`, so literal norms are bit-identical to computed ones."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return acc


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


# ---------------------------------------------------------------------------
# exact k-NN
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# hyperplane LSH
# ---------------------------------------------------------------------------

DEFAULT_NUM_PLANES = 48
DEFAULT_BITS_PER_TABLE = 8
DEFAULT_NUM_TABLES = 16
DEFAULT_MULTIPROBE = 2
_TABLE_STRIDE = 3  # offset between consecutive tables' bit windows


def plane_coeffs(num_planes: int, dim: int, seed: str = "hp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplane coefficients in
    [-1000, 1000], derived from md5 in the *driver* — they enter the
    plan as literal arrays (tiny, constant-folded) instead of per-row
    hash expressions, and any external engine can regenerate them.
    Whole-number coefficients make every product with a float32
    component exact in double precision (determinism contract above)."""
    planes = []
    for p in range(num_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:15], 16)
            row.append(float(h % 2001 - 1000))
        planes.append(row)
    return planes


def plane_bits(vec_col: Column, planes: list[list[float]]) -> Column:
    """``array<int>`` of sign bits, one per plane (bit p = 1 iff
    ``dot(vec, plane_p) > 0``), computed in ONE transform over the
    literal plane matrix — P dot folds per row, tiny expression tree."""
    return F.transform(
        _lit_matrix(planes),
        lambda p: F.when(_dot(vec_col, p) > 0, F.lit(1)).otherwise(F.lit(0)),
    )


def table_indices(
    num_planes: int, bits_per_table: int, num_tables: int, stride: int = _TABLE_STRIDE
) -> list[list[int]]:
    """Which shared-plane bits each hash table keys on: table t takes
    the ``bits_per_table``-wide window starting at ``t*stride`` (mod P).
    Sharing planes across tables costs some independence but divides
    the per-row projection work by ``num_tables``."""
    return [
        [(t * stride + j) % num_planes for j in range(bits_per_table)]
        for t in range(num_tables)
    ]


def _table_keys(bits_col: Column, tables: list[list[int]]) -> list[Column]:
    """One long bucket key per table: (table_index << b) | its bits —
    the offset keeps buckets from colliding across tables."""
    keys = []
    for t, idxs in enumerate(tables):
        b = len(idxs)
        key = F.lit(t << b).cast("long")
        for j, ix in enumerate(idxs):
            key = key + F.element_at(bits_col, ix + 1).cast("long") * F.lit(2**j).cast("long")
        keys.append(key)
    return keys


def probe_masks(bits_per_table: int, multiprobe: int) -> list[int]:
    """XOR masks for multiprobe: the bucket itself, then every 1-bit
    flip, then every 2-bit flip (when ``multiprobe>=2``).  Flipping low
    bits only — the table-index offset in the key survives the XOR."""
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << f for f in range(bits_per_table)]
    if multiprobe >= 2:
        masks += [
            (1 << f) | (1 << g)
            for f in range(bits_per_table)
            for g in range(f + 1, bits_per_table)
        ]
    return masks


def lsh_candidate_pairs(
    embeddings: DataFrame,
    query_ids: list[int],
    num_planes: int = DEFAULT_NUM_PLANES,
    bits_per_table: int = DEFAULT_BITS_PER_TABLE,
    num_tables: int = DEFAULT_NUM_TABLES,
    multiprobe: int = DEFAULT_MULTIPROBE,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "hp",
) -> DataFrame:
    """Distinct (query_id, neighbor_id) candidate pairs: neighbor's key
    equals one of the query's probed keys in at least one table.

    The corpus side carries ONE key per table (narrow posting rows);
    the multiprobe expansion happens on the tiny broadcast query side.
    """
    planes = plane_coeffs(num_planes, dim, seed)
    tables = table_indices(num_planes, bits_per_table, num_tables)
    # bits are hoisted to a real column so each of the ~B*L key terms
    # references it by name instead of inlining the P-plane projection
    emb_bits = embeddings.withColumn("__bits", plane_bits(F.col(vec_col), planes))
    keys = F.array(*_table_keys(F.col("__bits"), tables))

    base = emb_bits.select(
        F.col(id_col).alias("neighbor_id"), F.explode(keys).alias("bucket")
    )
    masks = probe_masks(bits_per_table, multiprobe)
    masks_lit = F.expr("array(" + ",".join(f"{m}L" for m in masks) + ")")
    probed = F.flatten(
        F.transform(keys, lambda k: F.transform(masks_lit, k.bitwiseXOR))
    )
    queries = emb_bits.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.explode(probed).alias("bucket")
    )
    return (
        F.broadcast(queries)
        .join(base, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = DEFAULT_NUM_PLANES,
    bits_per_table: int = DEFAULT_BITS_PER_TABLE,
    num_tables: int = DEFAULT_NUM_TABLES,
    multiprobe: int = DEFAULT_MULTIPROBE,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via shared-plane multiprobe LSH; exact cosine
    re-ranks the candidates.  Output: (query_id, neighbor_id, rank, sim).

    Defaults hit recall >= 0.9 vs :func:`cosine_topk` on the isotropic
    fixture (the worst case — see module docstring); on clustered
    corpora they prune to a few percent.  Deterministic end-to-end, so
    the driver oracle replays the full bucket->candidate->re-rank
    pipeline in SQL.
    """
    pair_ids = lsh_candidate_pairs(
        embeddings, query_ids, num_planes, bits_per_table, num_tables,
        multiprobe, dim, id_col, vec_col,
    )
    q_vecs = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _sqnorm(F.col(vec_col)).alias("q_sq"),
        )
    )
    # corpus scan stays map-side: candidate ids and query vectors are
    # both broadcast, so the expensive vectors never shuffle
    cands = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _sqnorm(F.col(vec_col)).alias("c_sq"),
        )
        .join(F.broadcast(pair_ids), "neighbor_id")
        .join(q_vecs, "query_id")
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


# ---------------------------------------------------------------------------
# IVF-flat
# ---------------------------------------------------------------------------

DEFAULT_N_CELLS = 32
DEFAULT_N_PROBE = 20


def _scored_cells(
    vec_col: Column, centroids: list[list[float]], sq_col: Column | None = None
) -> Column:
    """``array<struct<s,cell>>`` of rounded cosine scores of the vector
    against every centroid.  Centroid squared norms are Python-side
    constants; the vector's squared norm is the hoisted ``sq_col`` (one
    fold per row) — each cell costs exactly one dot fold."""
    sq = _sqnorm(vec_col) if sq_col is None else sq_col
    norms = [_py_sqnorm(c) for c in centroids]
    scores = F.zip_with(
        _lit_matrix(centroids),
        _lit_vec(norms),
        lambda m, nrm: F.round(_dot(vec_col, m) / F.sqrt(sq * nrm), 6),
    )
    return F.transform(
        scores, lambda s, i: F.named_struct(F.lit("s"), s, F.lit("cell"), i)
    )


def _nearest_cell(
    vec_col: Column, centroids: list[list[float]], sq_col: Column | None = None
) -> Column:
    """Index of the highest-cosine centroid (ties -> highest index)."""
    return F.array_max(_scored_cells(vec_col, centroids, sq_col))["cell"]


def _probe_cells(
    vec_col: Column,
    centroids: list[list[float]],
    n_probe: int,
    sq_col: Column | None = None,
) -> Column:
    """Array of the ``n_probe`` highest-cosine centroid indices
    (score desc, cell desc — matches :func:`_nearest_cell` ties)."""
    scored = _scored_cells(vec_col, centroids, sq_col)
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
    return F.transform(top, lambda x: x["cell"])


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = DEFAULT_N_CELLS,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """IVF coarse quantizer: stride-sampled seeds + ``refine_iters``
    distributed Lloyd iterations.

    Seeds: ``count()`` (metadata-only on parquet) sizes a stride, then a
    pushed-down ``id % stride == 0`` filter collects ~n_cells rows which
    are ordered in the DRIVER — no global sort job.  Each Lloyd
    iteration is a map-side nearest-centroid assignment plus one
    groupBy(cell, dim) mean over posexploded components — only
    ``n_cells x dim`` aggregates ever reach the driver, so training cost
    is O(passes over corpus), independent of corpus size in driver
    memory.  Empty cells keep their previous centroid.
    """
    n = embeddings.count()
    stride = max(1, n // n_cells)
    seed_rows = (
        embeddings.filter(F.col(id_col) % stride == 0)
        .select(id_col, vec_col)
        .collect()
    )
    seed_rows.sort(key=lambda r: r[id_col])
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows[:n_cells]]
    for _ in range(refine_iters):
        assigned = embeddings.withColumn(_SQ, _sqnorm(F.col(vec_col))).select(
            _nearest_cell(F.col(vec_col), centroids, F.col(_SQ)).alias("cell"),
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
    n_cells: int = DEFAULT_N_CELLS,
    n_probe: int = DEFAULT_N_PROBE,
    refine_iters: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF-flat: corpus vectors are binned to
    their nearest coarse centroid; each query scans only its ``n_probe``
    closest cells, exact cosine re-ranks the candidates.

    Pass ``centroids`` to reuse a pretrained quantizer (the production
    pattern — the index is built once offline, e.g.
    ``ivf_pretrained.CENTROIDS``, and the whole query path becomes
    deterministic and oracle-replayable); otherwise ``refine_iters``
    distributed Lloyd passes train one on the fly.

    Per-query work is O(N * n_probe / n_cells) against an equi-join on
    the cell id — no range/cross join, queries broadcast.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_cells, refine_iters, id_col, vec_col
        )
    base = embeddings.withColumn(_SQ, _sqnorm(F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(_SQ).alias("c_sq"),
        _nearest_cell(F.col(vec_col), centroids, F.col(_SQ)).alias("cell"),
    )
    queries = F.broadcast(
        embeddings.filter(F.col(id_col).isin(query_ids))
        .withColumn(_SQ, _sqnorm(F.col(vec_col)))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col(_SQ).alias("q_sq"),
            F.explode(
                _probe_cells(F.col(vec_col), centroids, n_probe, F.col(_SQ))
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


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF inverted lists as ``partitionBy(cell)``
    parquet — the "build once, query many" half of IVF.  Each coarse
    cell becomes a physical partition, so a probe of ``n_probe`` cells
    is PARTITION PRUNING at the scan: a query touches n_probe/n_cells
    of the bytes no matter how large the corpus (the columnar analog of
    an ANN library's inverted-list seek).  Squared norms are
    precomputed into the index so queries pay zero norm folds."""
    base = embeddings.withColumn(_SQ, _sqnorm(F.col(vec_col))).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(_SQ).alias("sq"),
        _nearest_cell(F.col(vec_col), centroids, F.col(_SQ)).alias("cell"),
    )
    base.repartition("cell").write.mode(mode).partitionBy("cell").parquet(path)


def ivf_index_topk(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vecs: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = DEFAULT_N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a :func:`write_ivf_index` layout: per query, rank cells in
    the DRIVER (n_cells x dim floats — tiny), push ``cell IN (...)``
    into the scan so only the probed partitions are read, broadcast the
    query vectors, re-rank exactly.  ``query_vecs`` is [(qid, vector)]
    — at serving time queries arrive from outside the corpus."""
    probe_rows = []
    for qid, vec in query_vecs:
        sq = _py_sqnorm(vec)
        scored = []
        for i, c in enumerate(centroids):
            dot = 0.0
            for x, y in zip(vec, c):
                dot += float(x) * float(y)
            scored.append((round(dot / (sq * _py_sqnorm(c)) ** 0.5, 6), i))
        scored.sort(reverse=True)  # score desc, cell desc — engine ties
        for s, cell in scored[:n_probe]:
            probe_rows.append((qid, [float(x) for x in vec], sq, cell))
    probes = F.broadcast(
        spark.createDataFrame(
            probe_rows,
            f"query_id long, q_vec array<float>, q_sq double, cell int",
        )
    )
    cells = sorted({r[3] for r in probe_rows})
    index = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    cands = (
        index.join(probes, "cell")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn(
            "sim",
            cosine_with_norms(
                F.col("q_vec"), F.col(vec_col), F.col("q_sq"), F.col("sq")
            ),
        )
        .select(F.col("query_id"), F.col(id_col).alias("neighbor_id"), "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


# ---------------------------------------------------------------------------
# embedding near-duplicates
# ---------------------------------------------------------------------------

def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bits_per_table: int = 4,
    num_tables: int = 4,
    dim: int = 64,
    exact: bool = False,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).

    ``exact=True`` scores all pairs — quadratic, so pass ``block_col``
    (e.g. a cluster/label/shard key) to confine the self-join to blocks;
    oracle-checkable.  Default is the banded-LSH path: pairs must share
    a bucket in at least one table (disjoint 4-bit windows over 16
    shared planes), which at a high threshold has near-total recall
    since near-identical vectors agree on almost every hyperplane."""
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
        planes = plane_coeffs(num_planes, dim, "hp")
        tables = table_indices(
            num_planes, bits_per_table, num_tables, stride=bits_per_table
        )
        # narrow (id, bucket) posting join; vectors join back post-dedup;
        # bits hoisted to a column so key terms don't inline the projection
        withsig = embeddings.withColumn(
            "__bits", plane_bits(F.col(vec_col), planes)
        ).select(
            F.col(id_col).alias("doc"),
            F.explode(F.array(*_table_keys(F.col("__bits"), tables))).alias("bucket"),
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
