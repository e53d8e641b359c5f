"""Per-query ISOLATED contract sweep — for big fixture dirs (the Heaps
decade) where a single in-process sweep is fragile: one pathological
oracle can spill unbounded DuckDB temp (observed 45 GB) or OOM, taking
the remaining 150+ queries down with it.  Each query runs in its own
interpreter+JVM via ``tools/verify_contract.py <dir> <name>`` under a
wall-clock timeout; timeouts/crashes are recorded per query instead of
aborting the sweep.

Results land in ``CORRECTNESS_FULL_<DIRBASE>.json`` (same shape as
verify_contract's full-sweep record, plus ``oracle_timeout`` entries).

Usage: python tools/sweep_isolated.py SF_DIR [--timeout S] [--workers N]
       [--only a,b,c]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(sf_dir: str, name: str, timeout_s: int) -> tuple[str, str]:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "verify_contract.py"),
             sf_dir, name],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return name, f"oracle_timeout >{timeout_s}s (isolated)"
    for line in proc.stdout.splitlines():
        if line.startswith(f"{name}: "):
            return name, line[len(name) + 2 :].rsplit(" (", 1)[0]
    return name, f"NO_RESULT rc={proc.returncode}: {proc.stderr[-200:]}"


def main() -> None:
    args = sys.argv[1:]
    sf_dir, timeout_s, workers, only = None, 600, 4, None
    i = 0
    while i < len(args):
        if args[i] == "--timeout":
            timeout_s = int(args[i + 1]); i += 2
        elif args[i] == "--workers":
            workers = int(args[i + 1]); i += 2
        elif args[i] == "--only":
            only = args[i + 1].split(","); i += 2
        else:
            sf_dir = args[i]; i += 1
    assert sf_dir, "usage: sweep_isolated.py SF_DIR [--timeout S] [--workers N]"

    import __spark_entry__ as m

    names = only or list(m.queries())
    results: dict[str, str] = {}
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for name, res in ex.map(
            lambda n: run_one(sf_dir, n, timeout_s), names
        ):
            results[name] = res
            print(f"{name}: {res}", flush=True)

    bad = {
        k: v for k, v in results.items()
        if not (v.startswith("ok") or v.startswith("no_oracle")
                or v.startswith("oracle_timeout"))
    }
    timeouts = [k for k, v in results.items() if v.startswith("oracle_timeout")]
    base = os.path.basename(sf_dir.rstrip("/"))
    record = os.path.join(REPO, f"CORRECTNESS_FULL_{base.upper()}.json")
    with open(record, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "total": len(results),
             "ok": len(results) - len(bad) - len(timeouts),
             "timeouts": timeouts, "bad": bad, "results": results,
             "mode": f"isolated, timeout={timeout_s}s"},
            fh, indent=1, sort_keys=True)
    print(json.dumps({"total": len(results), "bad": list(bad),
                      "timeouts": timeouts, "record": record}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
