"""Text-analysis operators for large-scale training-data pipelines.

All expressions are native ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs anywhere in this module, so the
hot path stays vectorized at 100 TB.  Hashes use md5 substrings, which
every engine (Spark, DuckDB, Trino) computes identically, making
results oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny function-word profiles for the language-ID heuristic.  The
#: point is a deterministic, vectorizable n-gram/stopword scorer with
#: the shape of a real LID pass (fastText/CLD-style), not linguistic
#: completeness.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es": ("el", "la", "de", "y", "es", "que", "un", "por"),
    "fr": ("le", "la", "et", "est", "un", "que", "pour", "dans"),
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def hash64(col: Column) -> Column:
    """Deterministic 60-bit positive hash from md5 — identical in any
    engine that has md5 + hex parsing (used by oracles for parity;
    engine-internal paths may use xxhash64 for speed)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def text_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality statistics: length, token counts,
    punctuation / stopword ratios, and a composite quality score.

    One narrow projection over the scan; every metric is a Column
    expression so the whole thing codegens into a single pass.
    """
    toks = tokens(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.size(toks)
    n_bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]"), 0))
    stop = LANG_PROFILES["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    punct_ratio = F.round(n_punct.cast("double") / n_chars, 6)
    stop_ratio = F.round(n_stop.cast("double") / n_tokens, 6)
    avg_token_len = F.round(n_chars.cast("double") / n_tokens, 6)
    # Quality heuristic: long-enough docs with a healthy stopword rate
    # and low punctuation density (C4/Gopher-rule flavored).
    quality = F.round(
        F.least(n_tokens.cast("double") / 50.0, F.lit(1.0))
        * (1.0 - punct_ratio)
        * (0.5 + stop_ratio),
        6,
    )
    # counts cast to long: external oracles (DuckDB len()) emit BIGINT
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_punct.cast("long").alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_token_len.alias("avg_token_len"),
        quality.alias("quality_score"),
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: score each language profile by stopword
    hits, pick the argmax (ties broken by profile order).

    Emits per-language hit counts plus ``lang_pred`` so downstream
    filters can threshold on confidence.  Pure Column expressions.
    """
    toks = tokens(text_col)

    # NB: the lambda must take exactly one parameter — PySpark treats a
    # second parameter (even with a default) as the array-index column.
    def in_profile(words):
        return lambda t: t.isin(*words)

    hit_cols = {
        lang: F.size(F.filter(toks, in_profile(words)))
        for lang, words in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    best = F.lit(langs[0])
    best_hits = hit_cols[langs[0]]
    for lang in langs[1:]:
        is_better = hit_cols[lang] > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, hit_cols[lang]).otherwise(best_hits)
    return docs.select(
        F.col(id_col),
        *[hit_cols[lang].cast("long").alias(f"hits_{lang}") for lang in langs],
        best.alias("lang_pred"),
        F.round(
            best_hits.cast("double") / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("lang_confidence"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document fingerprints: md5 of the whitespace/punct-normalized
    text plus a 60-bit numeric hash (rolling-hash role, dp-style
    reconciliation key for dedup joins)."""
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return docs.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint_md5"),
        hash64(normalized).alias("fingerprint_h64"),
    )
