"""Offline BPE merge trainer: writes functions/bpe_pretrained.py.

Classic byte-pair-encoding training (reference: dp has no tokenizer;
this is the standard Sennrich et al. 2016 algorithm): start from
characters, repeatedly merge the most frequent adjacent pair (ties ->
lexicographically largest pair for determinism), applying each learned
merge to the training vocabulary with ONE left-to-right sweep.

Training corpus = the production pattern: a tokenizer is trained
OFFLINE on a reference lexicon and then applied at scale to corpora it
has never seen.  Here the lexicon is (a) the fixture corpus word
frequencies plus (b) a deterministic English morphology table
(common roots x affixes, Zipf-weighted) — the fixture vocabulary alone
(31 distinct words) cannot support a production-sized merge table, and
a real 100 TB deployment would likewise train its vocab on a curated
sample, not the raw corpus.

The learned merge list is frozen into the package.  Application-time
invariant (relied on by the engine AND the DuckDB oracle): a merge
producing token T always precedes any merge consuming T, therefore
applying the merges IN RANK ORDER with one non-overlapping
left-to-right sweep each is equivalent to the canonical
min-rank-first BPE encode loop (property-tested in
tests/test_properties.py).

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

# Deterministic offline training lexicon: common English roots x
# affixes with Zipf-style weights.  Public-knowledge morphology; the
# point is realistic subword statistics (-ing, -tion, -er, th-, ...)
# at a vocabulary size that supports >=1024 merges.
_ROOTS = [
    "the", "be", "have", "do", "say", "get", "make", "go", "know",
    "take", "see", "come", "think", "look", "want", "give", "use",
    "find", "tell", "ask", "work", "seem", "feel", "try", "leave",
    "call", "time", "person", "year", "way", "day", "thing", "man",
    "world", "life", "hand", "part", "child", "eye", "woman", "place",
    "week", "case", "point", "govern", "company", "number", "group",
    "problem", "fact", "act", "base", "cat", "center", "class",
    "connect", "consider", "count", "cover", "create", "cross", "cut",
    "develop", "differ", "direct", "discover", "express", "follow",
    "form", "found", "gather", "general", "happen", "help", "hold",
    "import", "include", "increase", "interest", "invent", "join",
    "keep", "kind", "late", "lead", "learn", "light", "line", "list",
    "live", "long", "love", "move", "nation", "natural", "open",
    "order", "organize", "pass", "pay", "play", "position", "possible",
    "power", "present", "press", "produce", "protect", "prove",
    "provide", "question", "read", "real", "reason", "record",
    "relate", "remember", "report", "represent", "require", "rest",
    "result", "return", "run", "school", "sense", "serve", "set",
    "show", "side", "sign", "simple", "sound", "south", "special",
    "stand", "start", "state", "station", "stay", "step", "stop",
    "story", "strong", "structure", "study", "subject", "suggest",
    "support", "sure", "surface", "system", "table", "term", "test",
    "train", "travel", "turn", "under", "unit", "value", "vary",
    "voice", "walk", "watch", "water", "wonder", "word", "write",
]
_SUFFIXES = [
    "", "s", "e", "es", "ed", "ing", "er", "ers", "est", "ly", "ion",
    "ions", "tion", "ation", "ment", "ments", "ness", "ful", "less",
    "able", "ity", "al", "ally", "ous", "ive", "ist", "ism", "ize",
    "ized", "ish",
]


def lexicon_freq() -> dict[str, int]:
    freq: dict[str, int] = {}
    for ri, root in enumerate(_ROOTS):
        for si, suf in enumerate(_SUFFIXES):
            w = root + suf
            if ALPHA_RE.match(w):
                freq[w] = freq.get(w, 0) + max(
                    1, 200_000 // ((ri + 1) * (si + 1))
                )
    return freq


def train(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    # word -> tuple of current pieces
    words = {w: tuple(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    pairs: collections.Counter = collections.Counter()
    # pair -> set of words currently containing it (incremental upkeep)
    where: dict[tuple[str, str], set[str]] = collections.defaultdict(set)
    for w, pieces in words.items():
        f = word_freq[w]
        for pr in zip(pieces, pieces[1:]):
            pairs[pr] += f
            where[pr].add(w)
    # Every merge must produce a UNIQUE token string: the engine's
    # canonical min-rank loop and the oracle's sequential replay are
    # only provably equal when each token has one creation rank.
    produced: set[str] = set()
    for _ in range(n_merges):
        live = sorted(
            ((c, p) for p, c in pairs.items() if c > 0), reverse=True
        )
        # ties -> lexicographically LARGEST pair (stable, deterministic)
        best = next((p for c, p in live if p[0] + p[1] not in produced), None)
        if best is None:
            break
        produced.add(best[0] + best[1])
        merges.append(best)
        a, b = best
        for w in list(where.get(best, ())):
            pieces = words[w]
            f = word_freq[w]
            for pr in zip(pieces, pieces[1:]):
                pairs[pr] -= f
                s = where.get(pr)
                if s is not None:
                    s.discard(w)
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            new = tuple(out)
            words[w] = new
            for pr in zip(new, new[1:]):
                pairs[pr] += f
                where[pr].add(w)
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    freq: collections.Counter = collections.Counter()
    for txt in t.column("text").to_pylist():
        if not txt:
            continue
        for tok in TOKEN_RE.findall(txt.lower()):
            if ALPHA_RE.match(tok):
                freq[tok] += 1
    for w, f in lexicon_freq().items():
        freq[w] += f
    merges = train(dict(freq), n_merges)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "financial_data_ingestion_pipeline_spark", "functions", "bpe_pretrained.py",
    )
    with open(out, "w") as fh:
        fh.write('"""Frozen BPE merge list (trained by '
                 'scripts/train_bpe_merges.py on the sf0.01 fixture\n'
                 'plus the deterministic offline English lexicon).\n\n'
                 'Rank-ordered: a merge producing token T precedes any '
                 'merge consuming T, so\nsequential one-sweep application '
                 'equals the canonical min-rank BPE encode.\n'
                 'Regenerate with that script."""\n\n')
        fh.write("MERGES = [\n")
        for a, b in merges:
            fh.write(f"    ({a!r}, {b!r}),\n")
        fh.write("]\n")
    print(f"wrote {len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
