"""JDBC sink smoke test (S7) against embedded Derby — the in-JVM
database Spark already ships for its Hive metastore, so the round-trip
exercises the real JDBC write/read path with no external RDBMS."""

import pytest

from financial_data_ingestion_pipeline_spark.operators.warehouse import jdbc_append

DERBY_URL = "jdbc:derby:memory:fdip_jdbc_smoke;create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_append_roundtrip(spark):
    df = spark.createDataFrame(
        [("ALPHA", 100.5, 10), ("BETA", 50.25, 5), ("ALPHA", 101.0, 7)],
        "source_symbol string, ltp double, ltq int",
    )
    props = {"driver": DERBY_DRIVER}
    try:
        jdbc_append(df, DERBY_URL, table="ticks_smoke", properties=props)
    except Exception as exc:  # pragma: no cover - environment-dependent
        pytest.skip(f"embedded Derby unavailable: {exc}")
    back = spark.read.option("driver", DERBY_DRIVER).jdbc(DERBY_URL, "ticks_smoke")
    rows = sorted((r.source_symbol, r.ltp, r.ltq) for r in back.collect())
    assert rows == [("ALPHA", 100.5, 10), ("ALPHA", 101.0, 7), ("BETA", 50.25, 5)]
    # append semantics: a second write doubles the rows, never truncates
    jdbc_append(df, DERBY_URL, table="ticks_smoke", properties=props)
    assert back.count() == 6
