"""SparkSession factory.

Configs are chosen for cluster-scale execution and are equally safe on
``local[*]``:

- AQE on (runtime re-plan, partition coalescing, skew-join splitting),
  so an initial over-partitioned shuffle is cheap and skewed symbol
  keys do not straggle.
- UTC session timezone: all reference timestamps are naive wall-clock
  (parquet TIMESTAMP_NTZ / pandas datetime64), and correctness oracles
  compare wall-clock values.
- ``nanosAsLong`` because the driver fixtures carry nanosecond parquet
  timestamps, which Spark 4 otherwise refuses to read (the fixture
  loader converts the long back to a timestamp column).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dimension tables (bhavcopy ~2k symbols; region/nation/supplier)
    # should always broadcast; 64m is still tiny next to executor memory.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
}


def get_spark(
    app_name: str = "financial-data-ingestion-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``shuffle_partitions`` sizes the *initial* shuffle parallelism; AQE
    coalesces downward at runtime, so on a big cluster pass a large
    value (e.g. 2-3x total cores) and let AQE trim.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an existing session.

    Used when the session is created by an external harness (the
    driver's verify loop) rather than :func:`get_spark`.
    """
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.adaptive.enabled",
    ):
        try:
            spark.conf.set(key, ENGINE_CONF[key])
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    return spark
