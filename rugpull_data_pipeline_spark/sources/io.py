"""Batch IO layer: schema-explicit readers and scale-aware writers.

The reference's sources are a JSON file loader (S3,
``RECEIVER/file_utils.cpp:38-66``), a newline-delimited dimension file (S4,
``RECEIVER/file_utils.cpp:3-36``) and Redis dimension state (S9,
``SERVER/init_redis_maps.py:62-104``); its only sink is Arrow Flight / console
(S5/S11). On Spark those become format readers with DECLARED schemas (never
inference on production paths — inference is a full extra pass over 100 TB)
and parquet dimension directories whose per-micro-batch re-read gives the
reference's ST5 refresh contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json_documents(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """S3: semi-structured JSON with an explicit schema.

    ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` mirrors the
    reference's tolerance of malformed payloads (it guards length headers and
    skips bad blocks, ``RECEIVER/parser_main.cpp:92-97``) without failing the
    job: corrupt rows land in ``_corrupt`` for quarantine instead.
    """
    full = schema.add("_corrupt", T.StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_address_list(spark: SparkSession, path: str) -> DataFrame:
    """S4: newline-delimited watchlist file → one-column dimension, trimmed
    and de-duplicated (the xxHash-set load at RECEIVER/file_utils.cpp:3-36).
    Small by contract — broadcast it at the join site."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("address"))
        .where(F.length("address") > 0)
        .dropDuplicates(["address"])
    )


def read_csv_typed(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV with declared schema + header; malformed rows quarantined."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], max_records: int = 5_000_000
) -> None:
    """Partitioned parquet sink: directory partitioning gives readers
    partition pruning (the file-level analogue of the reference's structural
    skipping, SURVEY.md §4); ``maxRecordsPerFile`` bounds file size so a
    1000-executor read parallelizes without tiny-file pressure."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_col) at write
    time so equi-joins and aggregations on that column need NO shuffle at
    read time — the pre-partitioning strategy for repeatedly-joined 100 TB
    fact tables (SURVEY.md §4: the reference's slot-sharding does the same
    job for its one join key). Sorted within buckets for merge-friendly
    reads. ``path`` makes the table external (bucketing metadata still lives
    in the catalog — bucketed reads need ``spark.table``, not ``read.parquet``).
    """
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def upsert_dimension(
    spark: SparkSession,
    updates: DataFrame,
    dim_path: str,
    keys: list[str],
    order_by: list[str] | None = None,
) -> None:
    """S9/A2: dimension upsert — the Redis SADD/HSET state maintenance
    (SERVER/combined_subscriber.py:86-98) as a keyed last-writer-wins merge
    into a parquet dimension directory.

    With ``order_by`` set, the row with the greatest ``order_by`` tuple per
    key wins — a deterministic merge that is associative across micro-batches
    (max of maxes = global max), so any batch arrival order converges to the
    same dimension. Without it, new rows win over existing rows on ``keys``
    (arrival-order semantics, the Redis HSET shape). Readers that re-resolve
    the path per micro-batch (streaming/pipelines.stream_balance_pipeline)
    see the update on their next batch — the ST5 visibility contract. Writes
    stage to a temp subdir then swap, so a concurrent reader never sees a
    half-written directory. (On a lakehouse this function IS `MERGE INTO`;
    parquet-directory form keeps the repo dependency-free.)
    """
    import os
    import shutil
    import uuid

    from pyspark.sql import Window

    def dedup(df: DataFrame) -> DataFrame:
        if order_by is None:
            return df.dropDuplicates(keys)
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    try:
        existing = spark.read.parquet(dim_path)
        merged = dedup(updates.unionByName(existing))
    except Exception:
        merged = dedup(updates)
    staged = merged.cache()
    staged.count()  # materialize before we touch the directory it reads from
    tmp = f"{dim_path}__stage_{uuid.uuid4().hex[:8]}"
    staged.write.mode("overwrite").parquet(tmp)
    staged.unpersist()
    if os.path.exists(dim_path):
        shutil.rmtree(dim_path)
    os.rename(tmp, dim_path)


def show_chunk(df: DataFrame, n: int = 10) -> None:
    """S11: console pretty-print sink (SERVER/flightWithRedis.py:101-121)."""
    df.show(n, truncate=False)


def read_orc_typed(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC batch source — the other columnar format large lakes carry
    alongside parquet. Vectorized reader + predicate pushdown come free
    (same Catalyst paths the parquet scans use)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, max_records: int = 5_000_000) -> None:
    """ORC sink with bounded file sizes (zlib default compression)."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records))
        .orc(path)
    )


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary-file source: each file becomes one row of
    ``(path, modificationTime, length, content binary)`` — the canonical
    landing pattern for media blobs (images/audio/video) feeding the
    multimodal kernels (multimodal/columns.py): ingest here, attach typed
    metadata, and keep payloads out of shuffles from the first stage.

    Scale: one task per file (small files coalesce per
    ``spark.sql.files.maxPartitionBytes``); pair with
    ``pathGlobFilter`` so non-media droppings never enter the scan.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
