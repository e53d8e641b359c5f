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
       [--only a,b,c] [--merge] [--exclude name:reason]

``--merge`` updates only the ``--only`` queries inside the existing
record instead of writing a fresh one (for solo retries of queries a
contended sweep crashed).  ``--exclude name:reason`` stamps a query
as intentionally out of scope at this fixture (recorded verbatim, not
counted as ok or bad).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def run_one(sf_dir: str, name: str, timeout_s: int) -> tuple[str, str, float]:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "verify_contract.py"),
             sf_dir, name],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return name, f"oracle_timeout >{timeout_s}s (isolated)", float(timeout_s)
    for line in proc.stdout.splitlines():
        if line.startswith(f"{name}: "):
            status, _, tail = line[len(name) + 2 :].rpartition(" (")
            try:
                sec = float(tail.rstrip("s)"))
            except ValueError:
                status, sec = line[len(name) + 2 :], -1.0
            return name, status, sec
    return name, f"NO_RESULT rc={proc.returncode}: {proc.stderr[-200:]}", -1.0


def probe_drift() -> dict:
    """One fresh probe session shaped like verify_contract's per-query
    JVMs (local[8], 4g) — stamps the sweep record so per-query seconds
    from different sessions compare in calibrated terms."""
    from pyspark.sql import SparkSession

    from calibration import drift

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "4g")
             .getOrCreate())
    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        return drift(spark, "local8")
    finally:
        spark.stop()


def main() -> None:
    args = sys.argv[1:]
    sf_dir, timeout_s, workers, only = None, 600, 4, None
    merge, excludes = False, {}
    i = 0
    while i < len(args):
        if args[i] == "--timeout":
            timeout_s = int(args[i + 1]); i += 2
        elif args[i] == "--workers":
            workers = int(args[i + 1]); i += 2
        elif args[i] == "--only":
            only = args[i + 1].split(","); i += 2
        elif args[i] == "--merge":
            merge = True; i += 1
        elif args[i] == "--exclude":
            name, _, reason = args[i + 1].partition(":")
            excludes[name] = reason or "excluded"; i += 2
        else:
            sf_dir = args[i]; i += 1
    assert sf_dir, "usage: sweep_isolated.py SF_DIR [--timeout S] [--workers N]"

    import __spark_entry__ as m

    names = [n for n in (only or list(m.queries())) if n not in excludes]
    results: dict[str, str] = {}
    times: dict[str, float] = {}
    base = os.path.basename(sf_dir.rstrip("/"))
    record = os.path.join(REPO, f"CORRECTNESS_FULL_{base.upper()}.json")
    if merge and os.path.exists(record):
        with open(record) as fh:
            prior = json.load(fh)
        results.update(prior.get("results", {}))
        times.update(prior.get("times_s", {}))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for name, res, sec in ex.map(
            lambda n: run_one(sf_dir, n, timeout_s), names
        ):
            results[name] = res
            times[name] = sec
            print(f"{name}: {res} ({sec}s)", flush=True)
    try:
        calibration = probe_drift()
    except Exception as e:  # never fail the sweep over the probe
        calibration = {"probe_err": f"{type(e).__name__}: {e}"}

    for name, reason in excludes.items():
        results[name] = f"excluded: {reason}"
        times.pop(name, None)
    bad = {
        k: v for k, v in results.items()
        if not (v.startswith("ok") or v.startswith("no_oracle")
                or v.startswith("oracle_timeout")
                or v.startswith("excluded"))
    }
    timeouts = [k for k, v in results.items() if v.startswith("oracle_timeout")]
    excluded = [k for k, v in results.items() if v.startswith("excluded")]
    with open(record, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "total": len(results),
             "ok": len(results) - len(bad) - len(timeouts) - len(excluded),
             "excluded": excluded,
             "timeouts": timeouts, "bad": bad, "results": results,
             "times_s": times, "calibration": calibration,
             "mode": f"isolated, timeout={timeout_s}s"},
            fh, indent=1, sort_keys=True)
    print(json.dumps({"total": len(results), "bad": list(bad),
                      "timeouts": timeouts, "record": record}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
