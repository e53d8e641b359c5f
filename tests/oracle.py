"""Local replica of the driver's DuckDB correctness gate.

Runs a Spark DataFrame and a DuckDB SQL string over the same fixture
directory and compares row count, sorted column names, and values
(rows sorted order-insensitively).  Reports both exact-equality and
max float deviation so bit-level drift is visible before the driver
sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, duck_sql: str, sf_dir: str, float_tol: float = 1e-9) -> dict:
    con = duck_connect(sf_dir)
    try:
        expected = con.execute(duck_sql).fetch_df()
    finally:
        con.close()
    actual = spark_df.toPandas()

    report: dict = {"ok": True, "issues": [], "max_float_diff": 0.0}
    if sorted(actual.columns) != sorted(expected.columns):
        report["ok"] = False
        report["issues"].append(
            f"columns differ: spark={sorted(actual.columns)} duck={sorted(expected.columns)}"
        )
        return report
    if len(actual) != len(expected):
        report["ok"] = False
        report["issues"].append(f"row count: spark={len(actual)} duck={len(expected)}")
        return report
    if len(actual) == 0:
        return report

    a, e = _normalize(actual), _normalize(expected)
    for col in a.columns:
        av, ev = a[col], e[col]
        af_dtype = pd.api.types.is_float_dtype(av)
        ef_dtype = pd.api.types.is_float_dtype(ev)
        if af_dtype != ef_dtype and not (
            pd.api.types.is_object_dtype(av) or pd.api.types.is_object_dtype(ev)
        ):
            # e.g. Spark BIGINT vs a DuckDB HUGEINT sum surfacing as
            # float64 — numerically equal but the driver hashes the
            # string forms, so this WOULD mismatch there
            report["ok"] = False
            report["issues"].append(
                f"{col}: dtype drift spark={av.dtype} duck={ev.dtype} "
                "(driver hash would differ — add a CAST in the oracle)"
            )
            continue
        if af_dtype or ef_dtype:
            af = av.astype(float)
            ef = ev.astype(float)
            both_nan = af.isna() & ef.isna()
            diff = (af - ef).abs()
            diff[both_nan] = 0.0
            if diff.isna().any():
                report["ok"] = False
                report["issues"].append(f"{col}: NaN mismatch")
                continue
            mx = float(diff.max()) if len(diff) else 0.0
            report["max_float_diff"] = max(report["max_float_diff"], mx)
            if not math.isclose(mx, 0.0, abs_tol=float_tol):
                report["ok"] = False
                report["issues"].append(f"{col}: max |diff| = {mx}")
            elif mx != 0.0:
                report["issues"].append(f"{col}: nonzero-but-tolerated diff {mx}")
        else:
            if not av.astype(str).equals(ev.astype(str)):
                bad = (av.astype(str) != ev.astype(str))
                idx = bad[bad].index[:3].tolist()
                report["ok"] = False
                report["issues"].append(
                    f"{col}: {int(bad.sum())} mismatched values, e.g. rows {idx}: "
                    f"spark={av[idx].tolist()} duck={ev[idx].tolist()}"
                )
    return report
