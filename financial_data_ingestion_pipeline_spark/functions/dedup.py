"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Scale design
------------
- **Exact** dedup is a single hash-aggregate on the content key (one
  shuffle, map-side partial agg).
- **MinHash+LSH** follows the classic shingle -> k minhashes -> b bands
  -> bucket-join pipeline: signatures are computed in one codegen'd
  projection (higher-order functions over the shingle array, no
  explode of the shingle set), candidates come from a self-equi-join on
  the band key (shuffle keyed by band bucket — AQE skew-join handles
  hot buckets), and only candidate pairs pay the exact-Jaccard
  verification join.  Nothing is ever collected to the driver.
- **SimHash** is one projection per document (64-bit signature via
  per-bit majority over token hashes) + the same band-bucket join idea
  on 15-bit chunks for candidate pairs (hamming <= d implies chunk
  equality for some chunk when d < chunks).
- MinHash values are fixed-width md5-hex substrings compared as
  strings: lexicographic order on fixed-length lowercase hex equals
  numeric order, and md5 is engine-portable, which keeps every step
  oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64, tokens

DEFAULT_NUM_PERM = 12
DEFAULT_BANDS = 4  # rows per band = NUM_PERM / BANDS = 3
SHINGLE_N = 3


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups: one row per duplicated content value with
    the keeper id (min id) and copy count.  Single hash aggregate on
    md5(text) — the grouping key is the 32-char digest, not the full
    document, so the shuffle stays narrow at 100 TB."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The deduplicated corpus: keep the min-id row per distinct text.
    ``min_by`` over the full row avoids a second join back."""
    keep = F.min(id_col).alias("keep_id")
    keepers = docs.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(keep)
    return docs.join(
        keepers, (F.md5(F.col(text_col)) == keepers["__h"]) & (docs[id_col] == keepers["keep_id"])
    ).drop("__h", "keep_id")


def shingles(text_col: Column | str, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles as an array column (higher-order
    functions only — the shingle set never explodes into rows)."""
    toks = tokens(text_col)
    window_starts = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        window_starts,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col: Column, num_perm: int = DEFAULT_NUM_PERM) -> Column:
    """Array of ``num_perm`` minhash values.  Permutation ``i`` hashes
    each shingle as ``substr(md5(i || ':' || s), 1, 16)`` and takes the
    min — fixed-width hex strings order identically to their numeric
    value, and md5 makes the signature portable across engines."""
    # one-parameter lambda via factory: a second lambda parameter would be
    # interpreted by Spark as the array-index column, not the closure var.
    def perm_hash(i):
        return lambda s: F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 16)

    sigs = [F.array_min(F.transform(shingle_col, perm_hash(i))) for i in range(num_perm)]
    return F.array(*sigs)


def minhash_band_keys(
    sig_col: Column, num_perm: int = DEFAULT_NUM_PERM, bands: int = DEFAULT_BANDS
) -> Column:
    """Array of LSH band keys (band index || concatenated band rows)."""
    rows = num_perm // bands
    keys = [
        F.concat_ws(
            "|",
            F.lit(f"B{b}"),
            *[F.element_at(sig_col, b * rows + j + 1) for j in range(rows)],
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, exact-Jaccard verified.

    Pipeline: per-doc (shingles, signature, band keys) in ONE projection
    -> explode band keys -> self-join on band key (candidates) ->
    distinct pairs -> verify Jaccard on the distinct shingle sets ->
    filter >= threshold.  Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = shingles(text_col)
    prepared = docs.select(
        F.col(id_col).alias("doc"),
        sh.alias("sh"),
    ).withColumn("band_key", F.explode(minhash_band_keys(minhash_signature(F.col("sh"), num_perm), num_perm, bands)))

    left = prepared.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"), "band_key")
    right = prepared.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"), "band_key")
    cands = (
        left.join(right, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE_N,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share at
    least one shingle (inverted-index join — the exact counterpart of
    the LSH path; quadratic only within a shingle's posting list).
    """
    base = docs.select(F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh"))
    posting = base.select("doc", "sh", F.explode("sh").alias("gram"))
    l = posting.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"), "gram")
    r = posting.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"), "gram")
    cands = (
        l.join(r, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """Per-document SimHash signature (default 60 bits, from the 60-bit
    portable token hash): bit b of the signature is the majority vote of
    bit b across the document's distinct token hashes.

    Implemented as one projection: token-hash array, then per-bit
    popcount via higher-order ``aggregate`` — no explode, no shuffle.
    """
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: hash64(t))
    n_tok = F.size(hashes)

    # aggregate's merge lambda must take exactly (acc, x): capture the bit
    # index through a factory, never as an extra defaulted parameter.
    def bit_adder(b):
        return lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1).cast("long"))

    sig = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.aggregate(hashes, F.lit(0).cast("long"), bit_adder(b))
        sig = sig + F.when(ones * 2 > n_tok, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return docs.select(
        F.col(id_col), sig.alias("simhash"), n_tok.cast("long").alias("n_distinct_tokens")
    )


def simhash_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 60,
    chunks: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, found via the
    chunk-pigeonhole trick: if hamming(a,b) <= max_hamming < chunks,
    some ``bits/chunks``-bit chunk is identical, so an equi-join per
    chunk finds all such pairs without a cross join."""
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_key = [
        F.shiftrightunsigned(F.col(sig_col), c * width).bitwiseAND(F.lit(mask)).alias("chunk_val")
        for c in range(chunks)
    ]
    exploded = sigs.select(
        F.col(id_col).alias("doc"),
        F.col(sig_col).alias("sig"),
        F.posexplode(F.array(*chunk_key)),
    ).select("doc", "sig", F.concat_ws(":", "pos", "col").alias("chunk"))
    l = exploded.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"), "chunk")
    r = exploded.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"), "chunk")
    pairs = (
        l.join(r, "chunk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
