"""Demonstrate the knn_join scale lever: cells ∝ corpus size.

The contract query pins the FROZEN 47-cell pretrained quantizer
(functions/ivf_pretrained.py) for oracle replay, so a 10x corpus pays
~100x intra-cell pair work (scale audit: x41 over the sf0.1->sf1
step).  That is the quantizer serving data it wasn't sized for — the
production fix is retraining with n_cells proportional to n (IVF's
standard sqrt(n)-to-n/target_block sizing), not a plan change.

This script measures exactly that: knn_join at the small SF with the
frozen 47 cells vs the big SF with a quantizer whose cell count grew
with the data (deterministic sample of corpus vectors as centroids —
quality doesn't matter for the cost shape, only cell count/balance).
Writes the two timings + ratio to stdout and KNN_SCALE_DEMO.md.

Usage: python tools/knn_scale_demo.py [small_dir] [big_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "testdata_sf1")

    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions import similarity
    from financial_data_ingestion_pipeline_spark.functions.ivf_pretrained import (
        CENTROIDS,
    )
    from financial_data_ingestion_pipeline_spark.session import get_spark
    from financial_data_ingestion_pipeline_spark.sources import load_table

    spark = get_spark(
        app_name="knn-scale-demo",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def sample_centroids(df, n_cells: int) -> list[list[float]]:
        """Every (n/n_cells)-th vector by id — deterministic, corpus-
        spanning; for a cost demo balance matters, optimal placement
        doesn't."""
        n = df.count()
        step = max(1, n // n_cells)
        rows = (
            df.filter((F.col("vec_id") % step) == 0)
            .orderBy("vec_id")
            .limit(n_cells)
            .select("embedding")
            .collect()
        )
        return [list(r.embedding) for r in rows]

    def run(sf_dir: str, centroids: list[list[float]]) -> float:
        emb = load_table(spark, sf_dir, "embeddings")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            similarity.knn_join(emb, centroids, k=3).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    n_small = load_table(spark, small, "embeddings").count()
    n_big = load_table(spark, big, "embeddings").count()
    growth = n_big / n_small
    big_cells = max(len(CENTROIDS), int(round(len(CENTROIDS) * growth)))
    scaled = sample_centroids(load_table(spark, big, "embeddings"), big_cells)

    t_small = run(small, CENTROIDS)
    t_big_frozen = run(big, CENTROIDS)
    t_big_scaled = run(big, scaled)
    # round 7: centroids="auto" — ivf_cells_auto ladder + stride seeds,
    # the same lever with NO manual sizing/retrain step at all
    t_big_auto = run(big, "auto")
    auto_cells = similarity.ivf_cells_auto(n_big)

    lines = [
        "# KNN_SCALE_DEMO — cells ∝ corpus size flips knn_join to ~linear",
        "",
        f"Corpora: {os.path.basename(small)} (n={n_small}) -> "
        f"{os.path.basename(big)} (n={n_big}), {growth:.0f}x data.",
        "",
        "| configuration | time (s) | ratio vs small |",
        "|---|---|---|",
        f"| small SF, frozen {len(CENTROIDS)} cells | {t_small:.2f} | 1.0 |",
        f"| big SF, frozen {len(CENTROIDS)} cells (contract shape) "
        f"| {t_big_frozen:.2f} | {t_big_frozen / t_small:.1f}x |",
        f"| big SF, {big_cells} cells (cells ∝ n) "
        f"| {t_big_scaled:.2f} | {t_big_scaled / t_small:.1f}x |",
        f"| big SF, centroids='auto' ({auto_cells} cells, zero manual steps) "
        f"| {t_big_auto:.2f} | {t_big_auto / t_small:.1f}x |",
        "",
        "Frozen cells pay ~(growth)^2 intra-cell pair work.  Two levers",
        "attack that: the round-6 block-local matrix kernel moved the",
        "per-pair cost to numpy memory bandwidth (the frozen-cell row",
        "above is ~100x cheaper than the pre-kernel 60.8 s record, so at",
        "THIS corpus size every configuration is cheap and the kernel,",
        "not the quantizer, dominates), and round 7's centroids='auto'",
        "(ivf_cells_auto power-of-2 ~sqrt(n/2) ladder + stride-seed",
        "quantizer, both oracle-replayable from the data) removes the",
        "manual retrain step that quadratic asymptote otherwise demands —",
        "cells ~ sqrt(n) balances assignment (n*cells) against intra-cell",
        "pairs (n^2/cells), both ~n^1.5.  Heaps-decade isolated measure:",
        "knn_join_auto x1.84 for 10x data (SCALE_AUDIT_HEAPS.md).  The",
        "knn_join_auto contract query pins the ladder at the driver SFs,",
        "where it lands on the historical 32 cells; the original",
        "knn_join query keeps the frozen quantizer for the",
        "pretrained-constant replay path.",
    ]
    out = os.path.join(REPO, "KNN_SCALE_DEMO.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
