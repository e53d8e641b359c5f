"""Regenerate ``functions/ivf_pretrained.py`` — the frozen IVF coarse
quantizer used by `ann_ivf`, `knn_join`, and `semantic_dedup`.

Usage: python scripts/train_ivf_quantizer.py [sf_dir] [n_cells] [iters]
(defaults: /root/testdata/sf0.01, 32 cells, 2 Lloyd refinements).

The training itself is the distributed Lloyd loop in
``similarity.train_ivf_centroids`` (driver holds n_cells x dim floats
only); this script just freezes the result as Python literals so the
whole ANN query path — and its DuckDB oracle — is deterministic.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        train_ivf_centroids,
    )
    from financial_data_ingestion_pipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, n_cells=n_cells, refine_iters=iters)
    dim = len(centroids[0])

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "financial_data_ingestion_pipeline_spark",
        "functions",
        "ivf_pretrained.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Frozen IVF coarse quantizer: '
            f"{n_cells} centroids x {dim} dims.\n\n"
            f"Trained once with ``train_ivf_centroids(embeddings, "
            f"n_cells={n_cells},\nrefine_iters={iters})`` on the "
            f"{os.path.basename(sf_dir)} synthetic embeddings fixture\n"
            "(seed=42 driver data) — the production IVF pattern where the\n"
            "quantizer is built offline and reused, which also makes the "
            "whole\nquery path deterministic and oracle-replayable.  "
            "Regenerate with\n``scripts/train_ivf_quantizer.py``.\n"
            '"""\n\n'
            f"N_CELLS = {n_cells}\n"
            f"DIM = {dim}\n\n"
            "CENTROIDS = [\n"
        )
        for c in centroids:
            f.write("    [" + ", ".join(repr(v) for v in c) + "],\n")
        f.write("]\n")
    print(f"wrote {out} ({n_cells} x {dim})")


if __name__ == "__main__":
    main()
