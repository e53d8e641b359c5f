"""Frozen CPU drift probe for the scale-audit / contract-verify tools.

bench.py carries its own code-frozen probe (scan + synthetic) pinned
to the bench execution context; decade RATIO tables and sweep records
were still raw seconds, so comparing two scale audits recorded in
different sessions conflated box drift with code changes (round-9
verdict, next-round task #4).  This module gives every evidence tool
the SAME fixture-independent probe — the synthetic half of bench.py's
probe (range -> xxhash64 -> groupBy pmod sum: pure CPU + one shuffle,
no files, no package code) — with a per-context pinned reference.

The probe is CODE-FROZEN: never edit the job below, or every pinned
reference and every backfilled drift factor dies with it.  References
are pinned per SESSION CONTEXT (the round-9 lesson: the same probe
measures ~40% slower in a cold standalone session than mid-bench), so
each consumer passes the context key matching its own session shape:

* ``local32`` — get_spark local[32], 16g driver, post-warmup
  (scale_report's shared session; bench-shaped).
* ``local8``  — plain local[8], 4g driver, post-warmup
  (verify_contract / sweep_isolated's per-query JVMs).

Pinned on the round-10 box (2026-08-16), quiet machine, median of 5
fresh-session runs of the min-of-3 probe.

Calibration convention (same as bench.py / BENCH_CALIBRATION.md):
``drift_factor = probe_s / ref``; calibrated seconds = raw seconds
divided by drift_factor.  A drift_factor of 1.10 means the box ran
10% slower than the reference session, so raw numbers are deflated.
"""
from __future__ import annotations

CPU_PROBE_REFS = {
    "local32": 0.621,
    "local8": 0.4572,
}


def cpu_probe_s(spark) -> float:
    """Min-of-3 timing of the frozen synthetic job (identical to the
    CPU half of bench.py's probe).  Run AFTER the session's normal
    warmups; the first call's JIT noise is what min-of-3 absorbs."""
    import time

    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .groupBy((F.col("h") % 1024).alias("b"))
            # pmod keeps the sum ANSI-safe (sum(h) overflows long)
            .agg(F.count(F.lit(1)), F.sum(F.pmod("h", F.lit(1_000_000))))
            .write.format("noop").mode("overwrite").save()
        )
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def drift(spark, context: str) -> dict:
    """Probe the session and return the calibration record to embed in
    evidence files: probe seconds, the pinned reference for this
    context, and the drift factor (divide raw seconds by it)."""
    p = cpu_probe_s(spark)
    ref = CPU_PROBE_REFS[context]
    return {
        "probe_s": p,
        "probe_ref_s": ref,
        "probe_context": context,
        "drift_factor": round(p / ref, 4),
    }
