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


def ensure_event_time(df: DataFrame, names: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize event-time columns to session-TZ TIMESTAMP, whatever the
    source encoding.

    The driver has shipped event time under three encodings across rounds;
    accept them all (session TZ is pinned UTC in ``tune_session``, so every
    branch is value-preserving and agrees with DuckDB's ``epoch_us`` oracle
    view):

    1. TIMESTAMP(NANOS) read as nano-epoch longs (via
       ``spark.sql.legacy.parquet.nanosAsLong``) — truncate to micros, the
       same truncation DuckDB applies reading ns. Applied only to columns in
       ``names`` (a bare long is only event time where the schema says so).
    2. parquet ``timestamp[us]`` without tz metadata, which Spark reads as
       TIMESTAMP_NTZ — cast to TIMESTAMP so ``unix_micros()``,
       ``withWatermark()`` and RANGE frames resolve. Applied to EVERY NTZ
       column (the cast is the identity under a UTC session).
    3. plain TIMESTAMP — passes through untouched.
    """
    for f in df.schema.fields:
        if f.name in names and isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                f.name, F.expr(f"timestamp_micros({f.name} div 1000)")
            )
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the testdata tables as DataFrames keyed by table name."""
    tune_session(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        out[name] = ensure_event_time(spark.read.parquet(path))
    return out


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
