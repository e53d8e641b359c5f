"""Compare two bench.py JSON records (or driver BENCH_r{N}.json files).

Usage::

    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [--top 15]

Accepts either the raw one-line bench.py output or the driver's
wrapper ({"parsed": {...}}).  Prints per-query deltas sorted by
regression size plus added/removed queries, and exits non-zero if any
shared query regressed by more than 50% AND 1s (so CI can gate).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        line = next(
            ln for ln in text.splitlines() if ln.strip().startswith('{"metric')
        )
        d = json.loads(line)
    if "parsed" in d:
        d = d["parsed"]
    if "tail" in d and "queries" not in d:
        line = next(
            ln
            for ln in d["tail"].splitlines()
            if ln.strip().startswith('{"metric')
        )
        d = json.loads(line)
    return d


def main() -> int:
    argv, args, top = sys.argv[1:], [], 15
    i = 0
    while i < len(argv):
        if argv[i] == "--top":
            if i + 1 >= len(argv):
                print("--top requires a value", file=sys.stderr)
                return 2
            top = int(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = _load(args[0]), _load(args[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq), key=lambda q: oq[q] - nq[q])
    print(
        f"total: {old['value']:.1f}s ({len(oq)} queries) -> "
        f"{new['value']:.1f}s ({len(nq)} queries)"
    )
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        t = sum(nq[q] for q in added)
        print(f"added ({len(added)}, {t:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    print(f"\n{'query':30s} {'old':>7s} {'new':>7s} {'delta':>7s}")
    for q in shared[:top]:
        d = nq[q] - oq[q]
        print(f"{q:30s} {oq[q]:7.2f} {nq[q]:7.2f} {d:+7.2f}")
    bad = [
        q for q in shared if nq[q] > oq[q] * 1.5 and nq[q] - oq[q] > 1.0
    ]
    if bad:
        print(f"\nREGRESSIONS (>50% and >1s): {', '.join(sorted(bad))}")
        return 1
    print("\nno significant regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
