"""Property-based tests (hypothesis): the engine's distributed
operators must agree with reference single-node implementations
(pandas) on arbitrary generated inputs, not just fixtures."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from financial_data_ingestion_pipeline_spark.operators.asof import asof_join_backward
from financial_data_ingestion_pipeline_spark.operators.ohlc import daily_ohlc

BASE = dt.datetime(2022, 4, 4, 9, 0, 0)

# (symbol, seconds-offset, price) event lists; timestamps unique per
# symbol (the deterministic-OHLC tie-break is exercised separately).
_events = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.integers(min_value=0, max_value=7200),
        st.floats(min_value=0.5, max_value=1000, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),
)

_quotes = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.integers(min_value=0, max_value=7200),
        st.floats(min_value=0.5, max_value=1000, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(trades=_events, quotes=_quotes)
@_slow
def test_asof_matches_pandas_merge_asof(spark, trades, quotes):
    tdf = pd.DataFrame(
        [(s, BASE + dt.timedelta(seconds=o), float(p)) for s, o, p in trades],
        columns=["sym", "ts", "price"],
    )
    qdf = pd.DataFrame(
        [(s, BASE + dt.timedelta(seconds=o), float(p)) for s, o, p in quotes],
        columns=["sym", "qts", "quote"],
    )
    if not len(qdf):  # keep dtypes merge_asof-compatible when empty
        qdf = qdf.astype({"sym": str, "qts": "datetime64[ns]", "quote": float})
    left = spark.createDataFrame(tdf, "sym string, ts timestamp_ntz, price double")
    right = (
        spark.createDataFrame(qdf, "sym string, qts timestamp_ntz, quote double")
        if len(qdf)
        else spark.createDataFrame([], "sym string, qts timestamp_ntz, quote double")
    )
    got = (
        asof_join_backward(left, right, ["sym"], "ts", "qts", ["quote"])
        .toPandas()
        .sort_values(["sym", "ts"], ignore_index=True)
    )
    expected = pd.merge_asof(
        tdf.sort_values("ts", ignore_index=True),
        qdf.sort_values("qts", ignore_index=True),
        left_on="ts",
        right_on="qts",
        by="sym",
        direction="backward",
    ).sort_values(["sym", "ts"], ignore_index=True)
    assert list(got["price"]) == list(expected["price"])
    assert got["quote"].fillna(-1).tolist() == expected["quote"].fillna(-1).tolist()


@given(events=_events)
@_slow
def test_daily_ohlc_matches_pandas(spark, events):
    pdf = pd.DataFrame(
        [(s, BASE + dt.timedelta(seconds=o), float(p)) for s, o, p in events],
        columns=["sym", "ts", "price"],
    )
    df = spark.createDataFrame(pdf, "sym string, ts timestamp_ntz, price double")
    got = {
        (r.symbol, r.trade_date): (r.open, r.high, r.low, r.close)
        for r in daily_ohlc(
            df, symbol_col="sym", ts_col="ts", price_col="price"
        ).collect()
    }
    g = pdf.sort_values("ts").groupby([pdf["sym"], pdf["ts"].dt.date])["price"]
    expected = {
        k: (v.iloc[0], v.max(), v.min(), v.iloc[-1]) for k, v in g
    }
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k] == pytest.approx(expected[k])


@given(events=_events)
@_slow
def test_sessionize_matches_gap_model(spark, events):
    """Sessions from F.session_window == the gaps-and-islands model
    (new session iff gap STRICTLY exceeds the window) on random data."""
    from financial_data_ingestion_pipeline_spark.operators.analytics import (
        sessionize,
    )

    gap_s = 600
    pdf = pd.DataFrame(
        [(s, BASE + dt.timedelta(seconds=o), float(p)) for s, o, p in events],
        columns=["sym", "ts", "price"],
    )
    df = spark.createDataFrame(pdf, "sym string, ts timestamp_ntz, price double")
    got = {
        (r.symbol, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in sessionize(
            df, gap="10 minutes", symbol_col="sym", ts_col="ts", value_col="price"
        ).collect()
    }
    expected = {}
    for sym, g in pdf.sort_values("ts").groupby("sym"):
        start = prev = None
        n = 0
        for ts in g["ts"]:
            if start is None or (ts - prev).total_seconds() > gap_s:
                if start is not None:
                    expected[(sym, str(start))] = (
                        str(prev + dt.timedelta(seconds=gap_s)), n)
                start, n = ts, 0
            prev = ts
            n += 1
        if start is not None:
            expected[(sym, str(start))] = (str(prev + dt.timedelta(seconds=gap_s)), n)
    assert got == expected


@given(events=_events)
@_slow
def test_rolling_stats_matches_quadratic_model(spark, events):
    """Trailing range-window counts equal the O(n^2) reference
    (inclusive boundary at exactly window_seconds back)."""
    from financial_data_ingestion_pipeline_spark.operators.analytics import (
        rolling_stats,
    )

    win = 900
    pdf = pd.DataFrame(
        [(s, BASE + dt.timedelta(seconds=o), float(p)) for s, o, p in events],
        columns=["sym", "ts", "price"],
    )
    df = spark.createDataFrame(pdf, "sym string, ts timestamp_ntz, price double")
    got = {
        (r.symbol, str(r.ts)): r.roll_n
        for r in rolling_stats(
            df, window_seconds=win, symbol_col="sym", ts_col="ts",
            value_col="price",
        ).collect()
    }
    for _, row in pdf.iterrows():
        inside = pdf[
            (pdf.sym == row.sym)
            & (pdf.ts <= row.ts)
            & (pdf.ts >= row.ts - dt.timedelta(seconds=win))
        ]
        assert got[(row.sym, str(row.ts))] == len(inside)


_id_sets = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40,
    unique=True,
)


@_slow
@given(ids=_id_sets)
def test_shuffle_order_is_permutation(spark, ids):
    """For ANY id set, shuffle_order emits a bijection onto 0..n-1 that
    equals the rank of md5(seed:id) computed single-node."""
    import hashlib

    from financial_data_ingestion_pipeline_spark.functions.packing import (
        shuffle_order,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.global_pos for r in shuffle_order(df, seed="s").collect()}
    want_order = sorted(
        ids, key=lambda i: (hashlib.md5(f"s:{i}".encode()).hexdigest(), i)
    )
    want = {i: p for p, i in enumerate(want_order)}
    assert got == want


@_slow
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda t: t[0] < t[1]),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@pytest.mark.slow  # slow tier: 3-round distributed loop vs local replay (~15 s)
def test_pagerank_matches_single_node(spark, edges):
    """Integer PageRank equals a straightforward single-node replay of
    the same floor arithmetic on ANY small graph."""
    from financial_data_ingestion_pipeline_spark.functions.graph import (
        SCALE, pagerank,
    )

    df = spark.createDataFrame(edges, "item_a long, item_b long")
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}

    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    rank = {n: SCALE for n in adj}
    base = (15 * SCALE) // 100
    for _ in range(3):
        incoming = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            c = rank[n] // len(nbrs)
            for m in nbrs:
                incoming[m] += c
        rank = {n: base + (85 * incoming[n]) // 100 for n in adj}
    assert got == rank


@_slow
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=10),
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=30,
    )
)
def test_triangle_count_matches_bruteforce(spark, edges):
    """Degree-oriented distributed triangle counting equals a naive
    single-node enumeration on ANY small multigraph (duplicate and
    reversed edges must collapse; each triangle counts once per
    member node)."""
    from itertools import combinations

    from financial_data_ingestion_pipeline_spark.functions.graph import (
        triangle_count,
    )

    df = spark.createDataFrame(edges, "item_a long, item_b long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}

    undirected = {tuple(sorted(e)) for e in edges}
    nodes = {n for e in undirected for n in e}
    want: dict[int, int] = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if (
            (a, b) in undirected
            and (a, c) in undirected
            and (b, c) in undirected
        ):
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


@_slow
@given(
    parents=st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                     max_size=40)
)
def test_tree_depths_matches_chase(spark, parents):
    """Pointer jumping equals naive parent-chasing on ANY forest
    (parent pointers clipped to smaller indices force acyclicity)."""
    from financial_data_ingestion_pipeline_spark.functions.graph import (
        tree_depths,
    )

    edges = [
        (i, min(p, i - 1) if i > 0 else 0)
        for i, p in enumerate(parents)
    ]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {
        r.node: (r.root, r.depth)
        for r in tree_depths(df, max_depth=64).collect()
    }
    par = dict(edges)
    want = {}
    for n in par:
        cur, d = n, 0
        while par[cur] != cur:
            cur, d = par[cur], d + 1
        want[n] = (cur, d)
    assert got == want


def test_tree_depths_implicit_roots(spark):
    """A parent id absent from the child set is an implicit root: the
    chain terminates there instead of the node silently vanishing
    (1-based key sets have no self-parent row for the root)."""
    from financial_data_ingestion_pipeline_spark.functions.graph import (
        tree_depths,
    )

    edges = [(k, k // 10) for k in range(1, 31)]  # node 0 never a child
    got = {
        r.node: (r.root, r.depth)
        for r in tree_depths(
            spark.createDataFrame(edges, "child long, parent long"),
            max_depth=8,
        ).collect()
    }
    assert len(got) == 30
    assert all(root == 0 for root, _ in got.values())
    assert got[7] == (0, 1) and got[23] == (0, 2) and got[30] == (0, 2)


# words biased toward merge-substring overlap ('ererer', 'hashash', …)
_bpe_word = st.one_of(
    st.text(alphabet="erinowst", min_size=1, max_size=12),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12),
)


def _seq_pieces(word, merges):
    """Sequential rank-order application, one non-overlapping
    left-to-right sweep per merge, on the boundary-wrapped string —
    exactly the DuckDB oracle's list_reduce replay."""
    s = "".join(f"<{c}>" for c in word)
    for a, b in merges:
        s = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
    return s.count("<")


@settings(deadline=None, max_examples=25,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_bpe_word, min_size=1, max_size=12))
def test_bpe_canonical_equals_sequential_on_generated_words(words):
    """The engine's canonical min-rank BPE loop equals the oracle's
    sequential one-sweep-per-merge replay on arbitrary lowercase words
    — including adjacent-repeat strings ('ererer') where naive replace
    semantics historically diverged.  This is the bridge that makes
    the DuckDB oracle a faithful check of the canonical encoder (valid
    because trained merge lists are creation-ordered)."""
    from financial_data_ingestion_pipeline_spark.functions.bpe_pretrained import (
        MERGES,
    )
    from financial_data_ingestion_pipeline_spark.functions.text import (
        bpe_word_pieces,
    )

    ranks = {pair: i for i, pair in enumerate(MERGES)}
    for w in words:
        assert bpe_word_pieces(w, ranks) == _seq_pieces(w, MERGES), w


@settings(deadline=None, max_examples=20,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_bpe_word, min_size=1, max_size=12))
def test_bpe_encode_matches_python_reference_on_generated_words(
    spark, words
):
    """The distributed distinct-vocab BPE encoder equals a direct
    single-node canonical reference on arbitrary lowercase words."""
    from financial_data_ingestion_pipeline_spark.functions.bpe_pretrained import (
        MERGES,
    )
    from financial_data_ingestion_pipeline_spark.functions.text import (
        bpe_encode,
        bpe_word_pieces,
    )

    ranks = {pair: i for i, pair in enumerate(MERGES)}
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(1)], "doc_id long, text string"
    )
    got = bpe_encode(docs).collect()[0]
    want = sum(bpe_word_pieces(w, ranks) for w in words)
    assert got.n_bpe_pieces == want


def test_bpe_merge_table_invariants():
    """Direct structural invariants of the frozen merge list (advisor,
    round 4): the canonical==sequential bridge above is only valid
    when (1) every merge's PRODUCTION (a+b) is unique — a one-sweep
    replay can't conflate two rules — and (2) the list is
    producer-precedes-consumer ordered: any multi-character operand of
    merge i was itself produced by an earlier merge j < i, so the
    sequential replay has the operand available when rule i fires.
    The property tests check these probabilistically; this pins them
    exactly for the shipped table."""
    from financial_data_ingestion_pipeline_spark.functions.bpe_pretrained import (
        MERGES,
    )

    productions = [a + b for a, b in MERGES]
    assert len(set(productions)) == len(MERGES), "duplicate production"
    seen: set[str] = set()
    for i, (a, b) in enumerate(MERGES):
        for operand in (a, b):
            assert len(operand) == 1 or operand in seen, (
                f"merge {i} consumes {operand!r} before it is produced"
            )
        seen.add(a + b)


@_slow
@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_winnow_matches_python_reference(spark, texts):
    """winnow_fingerprints equals a direct single-node winnow (same
    md5 hash, window minima, RIGHTMOST tie) on ANY generated texts —
    the tiny 'ab x' alphabet forces repeated k-grams, so equal hashes
    inside one window exercise the tie rule for real."""
    import hashlib

    from financial_data_ingestion_pipeline_spark.functions.text import (
        winnow_fingerprints,
    )

    k, w = 5, 8

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(text: str) -> set[tuple[int, int]]:
        n_g = max(len(text) - k + 1, 0)
        if n_g == 0:
            return set()
        hs = [h64(text[i : i + k]) for i in range(n_g)]
        out = set()
        for j in range(max(n_g - w + 1, 1)):
            win = hs[j : j + w]
            m = min(win)
            idx = max(i for i, v in enumerate(win) if v == m)
            out.add((j + idx + 1, m))
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set[tuple[int, int]]] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {i: ref(t) for i, t in enumerate(texts) if ref(t)}
    assert got == want


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2", "s3"]),
            st.lists(
                st.sampled_from(["fox", "dog", "run", "the"]),
                min_size=0,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_dsir_weights_match_python_reference(spark, rows):
    """dsir_weights equals the integer formula replayed single-node
    (md5 buckets, add-one smoothing, floor-log2 via bit_length) on
    ANY generated corpus/target mix."""
    import hashlib
    import re
    from collections import Counter

    from financial_data_ingestion_pipeline_spark.functions.text import (
        dsir_weights,
    )

    targets, buckets, scale = ("s0", "s1"), 64, 1 << 20
    data = [(i, " ".join(ws), src) for i, (src, ws) in enumerate(rows)]

    def doc_buckets(text: str) -> list[int]:
        tk = re.split(r"\s+", text)
        gs = (
            [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]
            if len(tk) >= 2
            else [" ".join(tk)]
        )
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets
            for g in gs
        ]

    raw: Counter = Counter()
    tgt: Counter = Counter()
    per_doc = {}
    for doc_id, text, src in data:
        bs = doc_buckets(text)
        per_doc[doc_id] = bs
        for b in bs:
            raw[b] += 1
            if src in targets:
                tgt[b] += 1
    s = {
        b: max((scale * (tgt[b] + 1)) // (raw[b] + 1), 1).bit_length() - 21
        for b in raw
    }
    want = {
        doc_id: (len(bs), sum(s[b] for b in bs))
        for doc_id, bs in per_doc.items()
    }

    df = spark.createDataFrame(data, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.n_feats, r.logw_q)
        for r in dsir_weights(df, targets, buckets=buckets).collect()
    }
    assert got == want


@_slow
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=25,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_span_dedup_matches_python_reference(spark, texts):
    """span_dedup equals a direct single-node replay (chunking, df
    counting, drop df>max_df, positional reassembly) on ANY generated
    corpus — the 4-word alphabet forces heavy cross-document chunk
    collisions, exercising the drop path hard."""
    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        span_dedup,
    )

    width = 3
    docs = [(i, " ".join(ws)) for i, ws in enumerate(texts)]

    def chunks_of(text: str) -> list[str]:
        toks = text.split(" ") if text else [""]
        # mirror the engine: \s+ split of "" yields one empty token,
        # ceil(len/width) chunks, blank chunks dropped from occurrences
        out = []
        for j in range(0, len(toks), width):
            c = " ".join(toks[j : j + width])
            out.append(c)
        return out

    df_count: dict[str, set[int]] = {}
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in docs:
        occ = [
            (pos, c)
            for pos, c in enumerate(chunks_of(text))
            if c.strip() != ""
        ]
        per_doc[doc_id] = occ
        for _pos, c in occ:
            df_count.setdefault(c, set()).add(doc_id)
    want = {}
    for doc_id, occ in per_doc.items():
        kept = [c for _pos, c in occ if len(df_count[c]) <= 1]
        want[doc_id] = (len(occ), len(occ) - len(kept), " ".join(kept))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.clean_text)
        for r in span_dedup(sdf, width=width).collect()
    }
    assert got == want
    # branch parity: the round-11 max_df=1 window fast path must equal
    # the general count_distinct+join branch on the same corpus (the
    # general branch is forced via max_df=2 minus a df=2 re-check is
    # not possible here, so compare both code paths at their shared
    # point: max_df=1 output vs the python reference above covers the
    # fast path; the general branch is pinned by running max_df=2 and
    # asserting it never drops LESS than max_df=1 kept)
    got2 = {
        r.doc_id: (r.n_chunks, r.n_dropped)
        for r in span_dedup(sdf, width=width, max_df=2).collect()
    }
    for doc_id, (n_chunks, n_dropped, _txt) in want.items():
        n2_chunks, n2_dropped = got2[doc_id]
        assert n2_chunks == n_chunks
        assert n2_dropped <= n_dropped  # looser cap drops a subset


@_slow
@given(
    prefix_a=st.text(alphabet="uvw", min_size=0, max_size=10),
    prefix_b=st.text(alphabet="xyz", min_size=0, max_size=10),
    shared=st.text(alphabet="mn q", min_size=12, max_size=20),
)
def test_winnow_guarantee_shared_substring_shares_fingerprint(
    spark, prefix_a, prefix_b, shared
):
    """The winnowing GUARANTEE (Schleimer et al. 2003, Thm. in §3):
    any substring of length >= k + w - 1 shared between two documents
    forces at least one common selected hash.  k=5, w=8 here, so the
    12+-char shared block must always collide — regardless of the
    differing prefixes shifting its alignment."""
    from financial_data_ingestion_pipeline_spark.functions.text import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(0, prefix_a + shared), (1, prefix_b + shared)],
        "doc_id long, text string",
    )
    fps: dict[int, set[int]] = {0: set(), 1: set()}
    for r in winnow_fingerprints(df, k=5, w=8).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[0] & fps[1], "shared >= k+w-1 substring must share a fingerprint"


@_slow
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_repeated_spans_matches_python_reference_on_any_texts(spark, texts):
    """repeated_spans equals the brute-force anchor construction on ANY
    generated texts: the 3-char alphabet makes >= min_len repeats (and
    within-doc repeats, exact-boundary islands, overlapping anchor
    runs) common enough to exercise every merge path.  min_len=6 keeps
    anchors plentiful at these sizes."""
    from collections import Counter

    from financial_data_ingestion_pipeline_spark.functions.dedup import (
        repeated_spans,
    )

    L = 6
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in repeated_spans(df, min_len=L).collect()
    }

    anchors: Counter = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            anchors[t[i : i + L]] += 1
    want = set()
    for did, t in enumerate(texts):
        kept = [
            i + 1
            for i in range(len(t) - L + 1)
            if anchors[t[i : i + L]] >= 2
        ]
        if not kept:
            continue
        start = prev = kept[0]
        for p in kept[1:]:
            if p > prev + L:
                want.add((did, start, prev - start + L))
                start = p
            prev = p
        want.add((did, start, prev - start + L))
    assert got == want


# salted_join identity (round-10 verdict task #7): keys drawn from a
# small domain so some keys are hot, some match nothing on either
# side — the null-extension interaction with salt replication is the
# classic silent-dup bug class for LEFT joins, and the replicated
# small side makes RIGHT/FULL unsound by construction (rejected).
_salt_big = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=-(2**62), max_value=2**62),
    ),
    min_size=0, max_size=40,
)
_salt_small = st.lists(
    st.tuples(st.integers(min_value=3, max_value=9), st.text(max_size=4)),
    min_size=0, max_size=12,
)


@given(big_rows=_salt_big, small_rows=_salt_small)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
    ],
)
@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_row_identical_to_plain(spark, how, big_rows, small_rows):
    from financial_data_ingestion_pipeline_spark.operators.joins import (
        salted_join,
    )

    big = spark.createDataFrame(
        pd.DataFrame(big_rows or [(0, 0)][:0], columns=["k", "v"]).astype(
            {"k": "int64", "v": "int64"}
        ),
        schema="k long, v long",
    )
    small = spark.createDataFrame(
        pd.DataFrame(
            small_rows or [(0, "")][:0], columns=["k", "name"]
        ).astype({"k": "int64"}),
        schema="k long, name string",
    )
    from collections import Counter

    plain = big.join(small, "k", how)
    salted = salted_join(big, small, "k", n_salts=4, how=how)
    assert salted.columns == plain.columns
    # multiset compare (Counter): left-join rows carry None, which
    # sorted() can't order against strings
    assert Counter(map(tuple, salted.collect())) == Counter(
        map(tuple, plain.collect())
    )


def test_salted_join_rejects_replica_duplicating_modes(spark):
    from financial_data_ingestion_pipeline_spark.operators.joins import (
        salted_join,
    )

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salt replica"):
            salted_join(df, df.select("k"), "k", how=how)
