"""Offline PQ codebook trainer: writes functions/pq_pretrained.py.

Product quantization splits the 64-dim embedding into M=8 contiguous
8-dim subspaces and learns K=16 L2 centroids per subspace (per-subspace
k-means).  Run once against the sf0.01 fixture; the resulting literals
are frozen into the package (the production FAISS pattern: codebooks
are trained offline on a sample and reused), which also makes the whole
IVF-PQ query path deterministic and oracle-replayable.

Usage: python scripts/train_pq_codebooks.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

M = 8          # subspaces
SUBDIM = 8     # dims per subspace
K = 16         # centroids per subspace
ITERS = 10


def train(emb: np.ndarray) -> list[list[list[float]]]:
    n, dim = emb.shape
    assert dim == M * SUBDIM
    books: list[list[list[float]]] = []
    for m in range(M):
        X = emb[:, m * SUBDIM:(m + 1) * SUBDIM].astype(np.float64)
        # deterministic seeds: stride-sampled rows in id order
        stride = max(1, n // K)
        C = X[::stride][:K].copy()
        for _ in range(ITERS):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(K):
                mask = assign == j
                if mask.any():
                    C[j] = X[mask].mean(axis=0)
        books.append([[float(v) for v in row] for row in C])
    return books


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = t.to_pandas().sort_values("vec_id")
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    books = train(emb)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "financial_data_ingestion_pipeline_spark", "functions", "pq_pretrained.py",
    )
    with open(out, "w") as fh:
        fh.write('"""Frozen product-quantization codebooks: ')
        fh.write(f"{M} subspaces x {K} centroids x {SUBDIM} dims.\n\n")
        fh.write("Trained by scripts/train_pq_codebooks.py (per-subspace k-means\n")
        fh.write("on the sf0.01 embeddings fixture); regenerate with that script.\n")
        fh.write('"""\n\n')
        fh.write(f"SUBSPACES = {M}\nSUBDIM = {SUBDIM}\nN_CODES = {K}\n\n")
        fh.write("CODEBOOKS = [\n")
        for book in books:
            fh.write("    [\n")
            for row in book:
                fh.write("        [" + ", ".join(repr(v) for v in row) + "],\n")
            fh.write("    ],\n")
        fh.write("]\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
