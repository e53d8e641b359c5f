"""Dump .explain("formatted") for contract queries to files.

Usage: python tools/dump_plans.py OUTDIR [sf_dir] [name ...]

One file per query: OUTDIR/<name>.txt.  Used to commit the
plans/r11/<query>_before.txt / _after.txt evidence the optimization
rounds require.  Plans are captured at the given SF (default sf0.1 —
the bench SF, so join-strategy/AQE thresholds match what the bench
executes) with the bench's own session shape (local[32],
shuffle_partitions=32).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    outdir = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    only = [a for a in rest if not os.path.isdir(a)]
    os.makedirs(outdir, exist_ok=True)

    from financial_data_ingestion_pipeline_spark.session import (
        evict_persisted,
        get_spark,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="fdip-plan-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    def formatted(df):
        return df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    names = only or list(m.queries())
    qs = m.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = formatted(df)
        except Exception as e:  # pragma: no cover - capture tool
            txt = f"ERR {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        evict_persisted()
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
