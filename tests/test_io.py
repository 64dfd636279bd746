"""Batch IO layer tests: schema-explicit readers, quarantine of corrupt rows,
partitioned writes with pruning, keyed dimension upsert (S3/S4/S9 mappings)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rugpull_data_pipeline_spark.sources.io import (
    read_address_list,
    read_csv_typed,
    read_json_documents,
    upsert_dimension,
    write_partitioned,
)


def test_json_reader_quarantines_corrupt(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{this is not json}\n"
        '{"id": 2, "v": "b"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = read_json_documents(spark, str(p), schema)
    rows = df.collect()
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt


def test_address_list_trim_dedup(spark, tmp_path):
    p = tmp_path / "watch.txt"
    p.write_text("addr1\n  addr2  \n\naddr1\n")
    df = read_address_list(spark, str(p))
    assert sorted(r.address for r in df.collect()) == ["addr1", "addr2"]


def test_csv_typed_roundtrip(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("k,price\n1,1.5\n2,2.5\n")
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("price", T.DoubleType())]
    )
    df = read_csv_typed(spark, str(p), schema)
    assert {(r.k, r.price) for r in df.collect()} == {(1, 1.5), (2, 2.5)}


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "part_out")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # Partition pruning: the filtered scan must read only one directory.
    plan = (
        back.where(F.col("event_type") == "purchase")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "event_type=purchase" in plan or "PartitionFilters" in plan


def test_upsert_dimension_last_writer_wins(spark, tmp_path):
    dim = str(tmp_path / "dim")
    v1 = spark.createDataFrame([("p1", 1.0), ("p2", 2.0)], "pair string, price double")
    upsert_dimension(spark, v1, dim, ["pair"])
    v2 = spark.createDataFrame([("p2", 9.0), ("p3", 3.0)], "pair string, price double")
    upsert_dimension(spark, v2, dim, ["pair"])
    got = {r.pair: r.price for r in spark.read.parquet(dim).collect()}
    assert got == {"p1": 1.0, "p2": 9.0, "p3": 3.0}


def test_orc_roundtrip_pushdown(spark, tmp_path):
    """ORC write/read roundtrip preserves values; filters reach the scan."""
    from rugpull_data_pipeline_spark.sources.io import read_orc_typed, write_orc

    src = spark.range(0, 1000).selectExpr(
        "id", "cast(id % 7 as int) AS bucket", "concat('v', id) AS label"
    )
    path = str(tmp_path / "orc_t")
    write_orc(src, path)
    back = read_orc_typed(spark, path)
    assert back.count() == 1000
    got = back.where("bucket = 3").count()
    assert got == src.where("bucket = 3").count()
    plan = back.where("bucket = 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "bucket" in plan


def test_binary_file_source_blob_shape(spark, tmp_path):
    """binaryFile rows carry (path, length, content) for media landing."""
    from rugpull_data_pipeline_spark.sources.io import read_binary_files

    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    payloads = {f"img_{i:02d}.bin": bytes([i] * (16 + i)) for i in range(5)}
    (blob_dir / "ignore.txt").write_text("not media")
    for name, data in payloads.items():
        (blob_dir / name).write_bytes(data)

    df = read_binary_files(spark, str(blob_dir), glob="*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 5
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    for name, data in payloads.items():
        assert by_name[name].length == len(data)
        assert bytes(by_name[name].content) == data


def test_ensure_event_time_type_matrix(spark, tmp_path):
    """ts arrives as nanos-long, TIMESTAMP, or TIMESTAMP_NTZ across driver
    fixture generations; ensure_event_time must map all three to the same
    session-TZ TIMESTAMP values so temporal plans (unix_micros RANGE frames,
    withWatermark) resolve regardless of encoding."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from rugpull_data_pipeline_spark.sources.tables import ensure_event_time

    micros = [1_700_000_000_000_000 + i * 1_000_000 for i in range(5)]

    variants = {}
    # nanos-as-long encoding (pre-r3 fixtures).
    variants["long_ns"] = pa.table({"ts": pa.array([m * 1000 for m in micros], pa.int64())})
    # timestamp[us] without tz → Spark TIMESTAMP_NTZ (r3+ fixtures).
    variants["ntz"] = pa.table({"ts": pa.array(micros, pa.timestamp("us"))})
    # timestamp[us, tz=UTC] → plain TIMESTAMP.
    variants["tstz"] = pa.table({"ts": pa.array(micros, pa.timestamp("us", tz="UTC"))})

    got = {}
    for name, tbl in variants.items():
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(tbl, path)
        df = ensure_event_time(spark.read.parquet(path))
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), name
        # The temporal expressions that broke round 3 must resolve...
        out = df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
        got[name] = [r.us for r in out]
        # ...including the event-time requirement of watermarks.
        df.withWatermark("ts", "10 minutes")

    assert got["long_ns"] == got["ntz"] == got["tstz"] == micros
