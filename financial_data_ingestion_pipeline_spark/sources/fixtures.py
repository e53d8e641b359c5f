"""Loaders for the driver-generated fixture tables (TESTDATA.md).

``events.parquet`` stores nanosecond timestamps, which Spark 4 only
reads via ``spark.sql.legacy.parquet.nanosAsLong`` — the loader sets
that conf and converts the long back to ``timestamp_ntz`` (microsecond
truncation, matching DuckDB's microsecond timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FIXTURE_TABLES
from ..session import ensure_runtime_conf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos (long) -> timestamp_ntz, truncated to micros.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_fixture_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}
