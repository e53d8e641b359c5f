"""Per-query replicate timer for trustworthy A/B calls.

The box swings +-13% run-to-run on whole-bench totals (four identical
trees measured 97.1-112.2 s in round 6), so single cold runs cannot
support keep/revert decisions on ~0.5 s per-query deltas.  This tool
runs each named query ``--reps`` times (each rep = min of two
back-to-back noop-sink executions, the same steady-state definition
bench.py reports) and prints median / min / max per query — the
median is the number a regression call may cite.

Replicates share one session by default (matches bench.py's regime);
``--isolate`` gives every query its own interpreter+JVM like
scale_report --isolate, for evidence tables.

Usage::

    python tools/ab_query.py [--sf DIR] [--reps N] [--isolate]
                             [--json FILE] name1 name2 ...
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _measure(spark, fn, sf_dir: str, reps: int) -> list[float]:
    from financial_data_ingestion_pipeline_spark.session import (
        evict_persisted,
    )

    out = []
    for _ in range(reps):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out.append(min(runs))
        evict_persisted()
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    isolate = False
    json_path = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--json":
            json_path = args[i + 1]
            i += 2
        elif args[i] == "--isolate":
            isolate = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    if not names:
        raise SystemExit(__doc__)

    if isolate:
        import subprocess

        results = {}
        for name in names:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--sf",
                    sf_dir,
                    "--reps",
                    str(reps),
                    name,
                ],
                capture_output=True,
                text=True,
            )
            hit = None
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    hit = json.loads(line)
            if proc.returncode != 0 or hit is None:
                raise SystemExit(
                    f"isolated {name} failed rc={proc.returncode}:\n"
                    f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
                )
            results.update(hit["queries"])
            r = results[name]
            print(
                f"{name}: median {r['median']:.3f}s  "
                f"[{r['min']:.3f}, {r['max']:.3f}] x{reps} [isolated]",
                flush=True,
            )
        payload = {"sf_dir": sf_dir, "reps": reps, "isolated": True,
                   "queries": results}
    else:
        from financial_data_ingestion_pipeline_spark.session import get_spark

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark(
            app_name="fdip-ab",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.ui.enabled": "false",
                "spark.driver.memory": "16g",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        import __spark_entry__ as contract

        qs = contract.queries()
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        def _py_noop(batches):
            yield from batches

        spark.range(0, 64, 1, numPartitions=8).mapInPandas(
            _py_noop, "id long"
        ).write.format("noop").mode("overwrite").save()

        results = {}
        for name in names:
            ts = _measure(spark, qs[name], sf_dir, reps)
            results[name] = {
                "median": round(statistics.median(ts), 4),
                "min": round(min(ts), 4),
                "max": round(max(ts), 4),
                "reps": ts and [round(t, 4) for t in ts],
            }
            print(
                f"{name}: median {results[name]['median']:.3f}s  "
                f"[{results[name]['min']:.3f}, {results[name]['max']:.3f}]"
                f" x{reps}",
                file=sys.stderr,
                flush=True,
            )
        payload = {"sf_dir": sf_dir, "reps": reps, "isolated": False,
                   "queries": results}
        spark.stop()

    line = json.dumps(payload)
    print(line)
    if json_path:
        with open(json_path, "w") as fh:
            fh.write(line)


if __name__ == "__main__":
    main()
