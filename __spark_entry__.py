"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the query registry of ``rugpull_data_pipeline_spark``: every
operator from SURVEY.md §2 (plus the LLM-pipeline additions) is a named
query with a DuckDB oracle twin where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rugpull_data_pipeline_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = _registry.all_queries()["flagship_balance_report"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column aliases)."""
    return _registry.all_oracles()
