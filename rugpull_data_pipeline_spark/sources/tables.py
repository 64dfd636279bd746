"""Batch sources for the driver-generated parquet testdata.

Parquet is the canonical columnar source: Catalyst pushes predicates and
prunes columns into the scan (check ``PushedFilters`` / ``ReadSchema`` in
``df.explain("formatted")``). At 100 TB the same loader works unchanged —
partition discovery, min/max skipping and column pruning are datasource-level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the testdata tables as DataFrames keyed by table name."""
    tune_session(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        # Parquet TIMESTAMP(NANOS) columns arrive as nano-epoch longs (via
        # spark.sql.legacy.parquet.nanosAsLong); truncate to micros with
        # integer division — same truncation DuckDB applies reading ns.
        for field in df.schema.fields:
            if field.name == "ts" and isinstance(field.dataType, T.LongType):
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
