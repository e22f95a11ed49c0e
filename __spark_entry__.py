"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``sfr_ingest_pipeline_spark.queries`` (SURVEY.md §2
coverage map is in that module's docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the CDC core — converge the
    events change-stream to latest state per key via salted two-phase
    last-writer-wins reduce (SURVEY.md §2.4 A3)."""
    from sfr_ingest_pipeline_spark.queries import q_lww_latest_event_per_user

    return q_lww_latest_event_per_user(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sfr_ingest_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sfr_ingest_pipeline_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
