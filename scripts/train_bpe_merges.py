"""Offline BPE merge trainer: writes functions/bpe_pretrained.py.

Classic byte-pair-encoding training over the alphabetic word
frequencies of the sf0.01 documents fixture: start from characters,
repeatedly merge the most frequent adjacent pair (ties -> lexicographic
pair order for determinism).  The learned merge list is frozen into the
package — the production tokenizer pattern (vocab trained offline on a
sample, applied at scale) — and both the Spark encoder and the DuckDB
oracle apply the merges as chained delimiter-safe string replaces.

Usage: python scripts/train_bpe_merges.py [sf_dir] [n_merges]
"""
from __future__ import annotations

import collections
import os
import re
import sys

import pyarrow.parquet as pq

TOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
ALPHA_RE = re.compile(r"^[a-z]+$")


def train(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    # word -> tuple of current pieces
    words = {w: tuple(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, pieces in words.items():
            f = word_freq[w]
            for a, b in zip(pieces, pieces[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        # ties -> lexicographically LARGEST pair (stable, deterministic)
        merges.append(best)
        a, b = best
        new_words = {}
        for w, pieces in words.items():
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    freq: collections.Counter = collections.Counter()
    for txt in t.column("text").to_pylist():
        if not txt:
            continue
        for tok in TOKEN_RE.findall(txt.lower()):
            if ALPHA_RE.match(tok):
                freq[tok] += 1
    merges = train(dict(freq), n_merges)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "financial_data_ingestion_pipeline_spark", "functions", "bpe_pretrained.py",
    )
    with open(out, "w") as fh:
        fh.write('"""Frozen BPE merge list (trained by '
                 'scripts/train_bpe_merges.py on the sf0.01 fixture).\n\n'
                 'Applied in order as delimiter-safe string replaces; '
                 'regenerate with that script."""\n\n')
        fh.write("MERGES = [\n")
        for a, b in merges:
            fh.write(f"    ({a!r}, {b!r}),\n")
        fh.write("]\n")
    print("wrote", out, "merges:", merges)


if __name__ == "__main__":
    main()
