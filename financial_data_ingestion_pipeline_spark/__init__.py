"""PySpark-native analytics engine with the query and data-processing
capabilities of saurabhiiit/Financial-Data-Ingestion-Pipeline.

The reference (``/root/reference/data_platform_final.py``) is a pandas +
PostgreSQL + Airflow batch ETL over NSE second-level tick data.  This
package re-expresses its full surface (ingest -> clean -> validate ->
warehouse -> query, SURVEY.md §2) as declarative Spark DataFrame / SQL
jobs, plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, parquet tuning)
- ``schemas``    explicit StructTypes (tick, bhavcopy, warehouse)
- ``sources``    readers (zip/CSV ticks, bhavcopy, fixture parquet) + sinks
- ``operators``  cleaning, quality, OHLC aggregation/windowing, analytics
- ``functions``  text analysis, dedup, similarity search, multimodal
- ``plans``      batch pipeline driver (replaces the Airflow DAG) + layout
- ``streaming``  Structured Streaming OHLC / stateful dedup
"""

__version__ = "0.1.0"
