"""Generate synthetic fixture sets in the driver tables' shape for
scale-decade audits (`tools/scale_report.py --small/--big ...`).

The driver ships sf0.001/0.01/0.1 only; the 100x claim needs a decade
where data cost dominates fixed cost.  This generator reproduces the
driver tables' schemas and measured distributions (key cardinality
ratios, value ranges, category frequencies, unit-norm 64-d
embeddings, exact-dup rate) at ``--scale`` times the sf0.1 row
counts, seeded and fully deterministic.  region/nation are fixed
dimensions and are copied verbatim from sf0.1.

Document text comes in two modes:

* default — the driver's FIXED 31-word vocabulary at every scale.
  Faithful to the driver's fixtures, but degenerate for shingle ops:
  the trigram space saturates (31^3 = 29,791 possible trigrams), so
  per-shingle document frequency grows ~linearly with the corpus and
  posting-join collision mass Σdf² grows ~quadratically — a property
  of the FIXTURE, not of real corpora (round-6 verdict "What's
  missing" #1; SCALE_AUDIT_SF1.md measured the saturation directly).
* ``--heaps`` — vocabulary follows Heaps' law like real text:
  V(T) = K·T^β over total token count T (K=8, β=0.5 — mid-range of
  published English estimates), with Zipf-Mandelbrot token
  frequencies (s=1.07, q=2.7).  A 10x corpus then has ~3.16x the
  vocabulary, per-shingle df stays ~flat, and shingle-op scale
  ratios measure PLAN shape instead of fixture degeneracy.  Generate
  BOTH decade endpoints with --heaps so the comparison is
  apples-to-apples.

Distributions were measured from /root/testdata/sf0.1 (see the
constants below); this is synthetic data in the driver's shape, NOT
the driver's generator — oracle-correctness sweeps still run on the
driver's own fixtures.

Usage::

    python tools/gen_sf.py [out_dir] [--scale N] [--heaps] [--seed S]
                           [--tables a,b,c]

Defaults: out_dir /root/repo/testdata_sf1, scale 10, driver vocab,
all tables.  ``--tables`` generates a SUBSET (e.g. ``documents`` for
a third text decade where the 610M-row lineitem would cost more to
materialize than any doc-family query reads).  Subset mode BURNS THE
RNG STREAM for skipped tables — every random draw still happens, in
the same order and size, and only the Python-side materialization
(string building, Arrow tables, parquet writes) is skipped — so a
table's content is bit-identical whether generated alone or as part
of the full set, and the committed heaps records stay valid.
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "the", "line", "small", "group", "batch", "data", "sort", "value",
    "hash", "filter", "big", "dup", "column", "order", "a", "vector",
    "part", "scan", "slow", "agg", "key", "window", "table", "merge",
    "join", "query", "row", "stream", "spark", "fast", "customer",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "red", "small", "green", "dim", "shiny"]
P_NOUN = ["ring", "bolt", "case", "drum", "tube", "wheel", "plate", "cap"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _ts_us(days_lo: str, days_hi: str, n: int, rng) -> np.ndarray:
    lo = np.datetime64(days_lo, "us").astype(np.int64)
    hi = np.datetime64(days_hi, "us").astype(np.int64)
    return rng.integers(lo, hi, n)


def _heaps_vocab(n_tokens: int) -> np.ndarray:
    """Deterministic pure-letter vocabulary of Heaps-law size
    V = ceil(8 * T^0.5): word i is its base-26 letter encoding
    (a, b, ..., z, ba, bb, ...) prefixed to avoid driver-vocab
    collisions only by happenstance — single letters and short
    strings are fine for the whitespace/\\W tokenizers."""
    v = int(np.ceil(8.0 * n_tokens ** 0.5))
    words = []
    for i in range(v):
        s, k = "", i
        while True:
            s = chr(ord("a") + k % 26) + s
            k //= 26
            if k == 0:
                break
        words.append(s)
    return np.array(words)


def _zipf_p(v: int) -> np.ndarray:
    """Zipf-Mandelbrot rank frequencies p_i ∝ 1/(i+q)^s, s=1.07 q=2.7
    (canonical English fits), normalized."""
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = 1.0 / (ranks + 2.7) ** 1.07
    return p / p.sum()


def main() -> None:
    args = sys.argv[1:]
    out = "/root/repo/testdata_sf1"
    scale = 10  # relative to sf0.1
    heaps = False
    seed = 42
    tables = None  # None -> all
    i = 0
    while i < len(args):
        if args[i] == "--scale":
            scale = int(args[i + 1])
            i += 2
        elif args[i] == "--heaps":
            heaps = True
            i += 1
        elif args[i] == "--seed":
            seed = int(args[i + 1])
            i += 2
        elif args[i] == "--tables":
            tables = set(args[i + 1].split(","))
            i += 2
        else:
            out = args[i]
            i += 1
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    def want(name: str) -> bool:
        return tables is None or name in tables

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    for fixed in ("region", "nation"):
        if not want(fixed):
            continue
        shutil.copyfile(
            os.path.join(SRC, f"{fixed}.parquet"),
            os.path.join(out, f"{fixed}.parquet"),
        )
        print(f"{fixed}: copied from sf0.1")

    # From here on every rng.* call is UNCONDITIONAL (subset mode must
    # burn the stream identically); only materialization is gated.
    n_cust = 15_000 * scale
    c_nat = rng.integers(0, 25, n_cust)
    c_bal = np.round(rng.uniform(-1000, 10000, n_cust), 2)
    c_seg = rng.integers(0, 5, n_cust)
    if want("customer"):
        write(
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                    "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                    "c_nationkey": pa.array(c_nat, pa.int32()),
                    "c_acctbal": c_bal,
                    "c_mktsegment": pa.array(np.array(SEGMENTS)[c_seg]),
                }
            ),
        )
    del c_nat, c_bal, c_seg

    n_supp = 1_000 * scale
    s_nat = rng.integers(0, 25, n_supp)
    s_bal = np.round(rng.uniform(-1000, 10000, n_supp), 2)
    if want("supplier"):
        write(
            "supplier",
            pa.table(
                {
                    "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                    "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                    "s_nationkey": pa.array(s_nat, pa.int32()),
                    "s_acctbal": s_bal,
                }
            ),
        )
    del s_nat, s_bal

    n_part = 20_000 * scale
    adj_i = rng.integers(0, len(P_ADJ), n_part)
    noun_i = rng.integers(0, len(P_NOUN), n_part)
    brand_i = rng.integers(1, 26, n_part)
    ptype_i = rng.integers(0, 6, n_part)
    psize = rng.integers(1, 51, n_part)
    pprice = np.round(rng.uniform(900, 1000, n_part), 2)
    if want("part"):
        adj = np.array(P_ADJ)[adj_i]
        noun = np.array(P_NOUN)[noun_i]
        write(
            "part",
            pa.table(
                {
                    "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                    "p_name": pa.array(
                        np.char.add(np.char.add(adj, " "), noun)
                    ),
                    "p_brand": pa.array([f"Brand#{b}" for b in brand_i]),
                    "p_type": pa.array(np.array(P_TYPES)[ptype_i]),
                    "p_size": pa.array(psize, pa.int32()),
                    "p_retailprice": pprice,
                }
            ),
        )
    del adj_i, noun_i, brand_i, ptype_i, psize, pprice

    n_ord = 150_000 * scale
    o_dates = _ts_us("1995-01-01", "2001-08-01", n_ord, rng)
    o_dates -= o_dates % 86_400_000_000  # midnight-aligned like the driver
    o_cust = rng.integers(0, n_cust, n_ord)
    o_stat = rng.integers(0, 3, n_ord)
    o_price = np.round(rng.uniform(1000, 500000, n_ord), 2)
    o_prio = rng.integers(0, 5, n_ord)
    if want("orders"):
        write(
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                    "o_custkey": pa.array(o_cust, pa.int64()),
                    "o_orderstatus": pa.array(
                        np.array(["O", "P", "F"])[o_stat]
                    ),
                    "o_totalprice": o_price,
                    "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
                    "o_orderpriority": pa.array(
                        np.array(PRIORITIES)[o_prio]
                    ),
                }
            ),
        )
    del o_dates, o_cust, o_stat, o_price, o_prio

    # lineitem: Poisson(3.07)+1 lines per order (measured mean 4.07)
    lines_per = rng.poisson(3.07, n_ord) + 1
    n_li = int(lines_per.sum())
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship = _ts_us("1995-01-02", "2001-11-04", n_li, rng)
    ship -= ship % 86_400_000_000
    l_part = rng.integers(0, n_part, n_li)
    l_supp = rng.integers(0, n_supp, n_li)
    l_price = np.round(qty * rng.uniform(900, 2100, n_li), 2)
    l_disc = np.round(rng.integers(0, 11, n_li) / 100.0, 2)
    l_tax = np.round(rng.integers(0, 9, n_li) / 100.0, 2)
    l_rf = rng.integers(0, 3, n_li)
    l_ls = rng.integers(0, 2, n_li)
    if want("lineitem"):
        l_orderkey = np.repeat(np.arange(n_ord), lines_per)
        linenumber = (
            np.arange(n_li)
            - np.repeat(np.cumsum(lines_per) - lines_per, lines_per)
            + 1
        )
        write(
            "lineitem",
            pa.table(
                {
                    "l_orderkey": pa.array(l_orderkey, pa.int64()),
                    "l_partkey": pa.array(l_part, pa.int64()),
                    "l_suppkey": pa.array(l_supp, pa.int64()),
                    "l_linenumber": pa.array(linenumber, pa.int32()),
                    "l_quantity": qty,
                    "l_extendedprice": l_price,
                    "l_discount": l_disc,
                    "l_tax": l_tax,
                    "l_returnflag": pa.array(np.array(["R", "N", "A"])[l_rf]),
                    "l_linestatus": pa.array(np.array(["O", "F"])[l_ls]),
                    "l_shipdate": pa.array(ship, pa.timestamp("us")),
                }
            ),
        )
    del lines_per, qty, ship, l_part, l_supp, l_price, l_disc, l_tax, l_rf, l_ls

    n_ev = 100_000 * scale
    n_users = 1_500 * scale
    ev_ts = _ts_us("2024-01-01", "2024-01-31", n_ev, rng)
    ev_user = rng.integers(0, n_users, n_ev)
    ev_type = rng.integers(0, 5, n_ev)
    ev_val = np.minimum(rng.exponential(50.0, n_ev), 560.0)
    ev_k = rng.integers(0, 100, n_ev)
    if want("events"):
        write(
            "events",
            pa.table(
                {
                    "event_id": pa.array(np.arange(n_ev), pa.int64()),
                    "ts": pa.array(np.sort(ev_ts), pa.timestamp("us")),
                    "user_id": pa.array(ev_user, pa.int64()),
                    "event_type": pa.array(np.array(EVENT_TYPES)[ev_type]),
                    "value": ev_val,
                    "props": pa.array([f'{{"k": {k}}}' for k in ev_k]),
                }
            ),
        )
    del ev_ts, ev_user, ev_type, ev_val, ev_k

    n_doc = 5_000 * scale
    n_words = rng.integers(9, 111, n_doc)
    if heaps:
        # Heaps-law vocabulary over the total token budget + Zipf-
        # Mandelbrot frequencies: distinct words grow ~sqrt(corpus),
        # per-shingle df stays ~flat as the corpus scales — the
        # property real corpora have and the driver fixture lacks
        total_tokens = int(n_words.sum())
        vocab = _heaps_vocab(total_tokens)
        p = _zipf_p(len(vocab))
        draws = rng.choice(len(vocab), total_tokens, p=p)
        offs = np.concatenate([[0], np.cumsum(n_words)])
        if want("documents"):
            texts = [
                " ".join(vocab[draws[offs[d]:offs[d + 1]]])
                for d in range(n_doc)
            ]
        # hot-anchor stressor: ONE fixed paragraph stamped onto enough
        # docs to be ~1% of corpus chars.  Real corpora carry exactly
        # this (license footers, nav chrome): every 16-char anchor
        # inside it has df ∝ corpus size, the skew class that melts
        # any per-key-partitioned plan (round-7 verdict on
        # repeated_spans).  Identical literal at both decade
        # endpoints so df grows 10x across the decade.
        boiler = (
            "all rights reserved unauthorized reproduction of this "
            "article is strictly prohibited subscribe to our daily "
            "newsletter for updates terms of service and privacy "
            "policy apply to all visitors"
        )
        # total corpus chars computed from the draws (word lengths +
        # k-1 separators per doc) — exact integer, identical to
        # sum(len(t)) over the built texts, but available without
        # materializing them (subset mode must keep n_stamp, hence
        # the next draw's SIZE, identical)
        wlen = np.array([len(w) for w in vocab])
        total_chars = int(wlen[draws].sum() + total_tokens - n_doc)
        n_stamp = max(2, round(0.01 * total_chars / (len(boiler) + 1)))
        stamp_at = rng.choice(n_doc, size=min(n_stamp, n_doc), replace=False)
        if want("documents"):
            for d in stamp_at:
                texts[d] = texts[d] + " " + boiler
        print(
            f"documents: heaps vocab |V|={len(vocab)} over "
            f"T={total_tokens} tokens; boilerplate on {n_stamp} docs "
            f"(~1% chars)"
        )
        del draws
    else:
        vocab = np.array(VOCAB)
        texts = []
        for k in n_words:
            w = rng.integers(0, len(vocab), k)  # drawn even when skipped
            if want("documents"):
                texts.append(" ".join(vocab[w]))
    langs_i = rng.choice(len(LANGS), n_doc, p=np.array(LANG_P) / sum(LANG_P))
    src_i = rng.integers(0, 20, n_doc)
    if want("documents"):
        # exact-dup rate ~0.16% (8 in 5000 measured): overwrite the tail
        n_dup = (8 * n_doc) // 5000
        for j in range(n_dup):
            texts[n_doc - 1 - j] = texts[j * 101 % (n_doc // 2)]
        langs = np.array(LANGS)[langs_i]
        write(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(langs),
                    "source": pa.array([f"src{s}" for s in src_i]),
                    "n_chars": pa.array(
                        np.array([len(t) for t in texts]), pa.int64()
                    ),
                }
            ),
        )

    n_emb = 2_000 * scale
    dim = 64
    labels = rng.integers(0, 10, n_emb)
    centroids = rng.standard_normal((10, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    # 0.065 centroid pull reproduces the measured ~0.004 mean
    # intra-label cosine (labels are near-noise in the driver data)
    vecs = rng.standard_normal((n_emb, dim)) + 0.065 * centroids[labels]
    if want("embeddings"):
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs.astype(np.float32)
        write(
            "embeddings",
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                    "embedding": pa.array(
                        list(vecs), pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            ),
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
