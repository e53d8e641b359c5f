"""Scale audit: steady-state per-query time at two scale factors and
the observed scaling ratio — the empirical check behind every
"would this survive 100x?" claim in the docstrings.

Data grows 10x from sf0.01 to sf0.1.  A scan-bound operator should
scale ~linearly (ratio <= ~10); an operator with per-query fixed cost
(driver probe prep, tiny top-k shuffles) scales sublinearly; anything
super-linear (ratio >> 10) is a quadratic smell and gets flagged.

Writes SCALE_AUDIT.md.  Run on a quiet machine (same caveat as
bench.py); timings are min-of-two steady state through the noop sink.

Usage: python tools/scale_report.py [--quick name1,name2,...]
           [--small DIR] [--big DIR] [--out FILE] [--top N] [--isolate]

``--small/--big/--out`` select the decade (defaults sf0.01 -> sf0.1,
SCALE_AUDIT.md); ``--top N`` audits only the N slowest queries by
their BENCH_DETAIL.json sf0.1 time (the second-decade run audits the
top 30 — the fast tail is fixed-cost-bound and adds no evidence).

``--isolate`` runs every query in its OWN fresh interpreter+JVM
(subprocess per query).  A 30-query big-SF sweep in one session
contaminates the later queries — accumulated DISK_ONLY caches, heap
pressure from earlier multi-GB shuffles, GC debt — measured up to 2x
on the heaviest queries (ngram_jaccard 67 s isolated vs 98 s in the
shared session; quality_flags 10.9 s vs 20.5 s).  Isolated numbers
match the per-query methodology of the committed fix-wave records;
prefer --isolate for any table that will be committed as evidence.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    only = None
    small, big = SF_SMALL, SF_BIG
    out_path = os.path.join(REPO, "SCALE_AUDIT.md")
    top_n = None
    usage = (
        "usage: scale_report.py [--quick a,b] [--small DIR] [--big DIR]"
        " [--out FILE] [--top N]"
    )
    isolate = False
    i = 0
    while i < len(args):
        if args[i] == "--isolate":
            isolate = True
            i += 1
            continue
        if i + 1 >= len(args):
            raise SystemExit(f"{args[i]} needs a value\n{usage}")
        if args[i] == "--quick":
            only = set(args[i + 1].split(","))
        elif args[i] == "--small":
            small = args[i + 1]
        elif args[i] == "--big":
            big = args[i + 1]
        elif args[i] == "--out":
            out_path = args[i + 1]
        elif args[i] == "--top":
            top_n = int(args[i + 1])
        else:
            raise SystemExit(f"unknown arg {args[i]}\n{usage}")
        i += 2
    if top_n is not None:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)["queries"]
        only = set(
            sorted(detail, key=lambda k: -detail[k])[:top_n]
        ) | (only or set())

    if isolate:
        import re
        import subprocess

        import __spark_entry__ as contract

        cal = _probe()
        print(f"calibration: {cal}", flush=True)
        names = [n for n in contract.queries() if not only or n in only]
        rows = []
        pat = re.compile(
            r"^(\w+): ([0-9.]+)s -> ([0-9.]+)s  x([0-9.]+|inf)$"
        )
        for name in names:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--quick",
                    name,
                    "--small",
                    small,
                    "--big",
                    big,
                    "--out",
                    "/dev/null",
                ],
                capture_output=True,
                text=True,
            )
            hit = None
            for line in proc.stdout.splitlines():
                m = pat.match(line.strip())
                if m and m.group(1) == name:
                    hit = m
            if proc.returncode != 0 or hit is None:
                raise SystemExit(
                    f"isolated run for {name} failed (rc={proc.returncode}):\n"
                    f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
                )
            t_small, t_big = float(hit.group(2)), float(hit.group(3))
            ratio = t_big / t_small if t_small > 0 else float("inf")
            rows.append((name, t_small, t_big, ratio))
            print(
                f"{name}: {t_small:.3f}s -> {t_big:.3f}s  x{ratio:.2f}"
                " [isolated]",
                flush=True,
            )
        _write_report(rows, out_path, small, big, isolated=True, cal=cal)
        return

    from financial_data_ingestion_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="fdip-scale-audit",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as contract

    queries = contract.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    def _py_noop(batches):
        yield from batches

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, 64, 1, numPartitions=8).mapInPandas(
        _py_noop, "id long"
    ).write.format("noop").mode("overwrite").save()

    from calibration import drift

    cal = drift(spark, "local32")
    print(f"calibration: {cal}", flush=True)

    def steady(fn, sf_dir):
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return min(runs)

    rows = []
    for name, fn in queries.items():
        t_small = steady(fn, small)
        t_big = steady(fn, big)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows.append((name, t_small, t_big, ratio))
        print(f"{name}: {t_small:.3f}s -> {t_big:.3f}s  x{ratio:.2f}", flush=True)

    _write_report(rows, out_path, small, big, isolated=False, cal=cal)
    spark.stop()


def _probe() -> dict:
    """One fresh bench-shaped probe session (local[32], 16g — the same
    config every --quick subprocess uses) so isolated decade tables
    recorded in different sessions compare in calibrated seconds."""
    from financial_data_ingestion_pipeline_spark.session import get_spark

    from calibration import drift

    spark = get_spark(
        app_name="fdip-scale-probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        return drift(spark, "local32")
    finally:
        spark.stop()


def _write_report(rows, out_path, small, big, isolated, cal=None):
    rows = sorted(rows, key=lambda r: -r[3])
    small_lbl = os.path.basename(small.rstrip("/"))
    big_lbl = os.path.basename(big.rstrip("/"))
    iso_note = (
        "each query in its own fresh\ninterpreter+JVM (`--isolate` — no "
        "cross-query cache/heap contamination)"
        if isolated
        else "min of two\nruns through the noop sink"
    )
    d = (cal or {}).get("drift_factor")
    with open(out_path, "w") as fh:
        fh.write("# SCALE_AUDIT — steady-state time vs scale factor\n\n")
        if d:
            fh.write(
                f"Drift-calibrated: frozen CPU probe {cal['probe_s']} s vs "
                f"pinned ref {cal['probe_ref_s']} s ({cal['probe_context']})"
                f" → drift_factor {d}; calibrated columns divide raw"
                " seconds by it (tools/calibration.py), so tables recorded"
                " in different sessions compare like for like — the ratio"
                " column is drift-free either way (both decades measured"
                " in one run).\n\n"
            )
        fh.write(
            f"Data grows **10x** from {small_lbl} to {big_lbl} (local[32], "
            f"{iso_note}, generated by "
            "`tools/scale_report.py`).\nA ratio near or below 10x means the "
            "operator is scan/shuffle bound\n(the plan shape survives "
            "growth); well below 10x means per-query\nfixed costs dominate "
            "at this size; well above 10x would be a\nquadratic smell. "
            "Timing noise on this box is ~±15%.\n\n"
        )
        if d:
            fh.write(
                f"| query | {small_lbl} s | {big_lbl} s |"
                f" {small_lbl} cal s | {big_lbl} cal s |"
                " ratio (10x data) |\n"
            )
            fh.write("|---|---|---|---|---|---|\n")
            for name, a, b, r in rows:
                flag = " ⚠" if r > 12 else ""
                fh.write(
                    f"| {name} | {a:.3f} | {b:.3f} | {a / d:.3f} |"
                    f" {b / d:.3f} | {r:.2f}{flag} |\n"
                )
        else:
            fh.write(
                f"| query | {small_lbl} s | {big_lbl} s |"
                " ratio (10x data) |\n"
            )
            fh.write("|---|---|---|---|\n")
            for name, a, b, r in rows:
                flag = " ⚠" if r > 12 else ""
                fh.write(f"| {name} | {a:.3f} | {b:.3f} | {r:.2f}{flag} |\n")
        n_bad = sum(1 for *_x, r in rows if r > 12)
        fh.write(
            f"\n**{len(rows)} queries audited; {n_bad} above 12x.**\n"
        )
    print("wrote", out_path)


if __name__ == "__main__":
    main()
