"""The S1 block poller as a Spark Python DataSource (``solana_blocks``).

Proves three things about ``sources/block_datasource.py``:

1. the batch reader's worker shards implement the reference's round-robin
   slot sharding (``slot % n_workers``, SERVER/subscriber.py:111) and the
   payload bytes are identical to the file-landing-zone path;
2. the micro-batch stream reader (offset = next slot) drains a bounded slot
   range to exactly the batch result — S1's polling loop under Spark's
   offset/commit contract;
3. the datasource feeds the flagship extraction chain unchanged and the
   result matches the pure-Python reference oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rugpull_data_pipeline_spark.operators.balance import (
    extract_balance_changes,
    parse_blocks,
)
from rugpull_data_pipeline_spark.sources.block_datasource import (
    register_block_datasource,
)
from rugpull_data_pipeline_spark.sources.solana import (
    generate_blocks,
    hot_addresses,
    write_blocks_json,
)
from tests.test_solana_balance import python_oracle

N, WORKERS, FIRST = 12, 3, 1008  # FIRST % N == 0: slots hit blocks in order


def _batch_df(spark):
    register_block_datasource(spark)
    return (
        spark.read.format("solana_blocks")
        .option("n_blocks", N)
        .option("n_slots", N)
        .option("n_workers", WORKERS)
        .option("first_slot", FIRST)
        .option("seed", 7)
        .load()
    )


def test_batch_sharding_and_file_parity(spark, tmp_path):
    df = _batch_df(spark)
    rows = df.withColumn("pid", F.spark_partition_id()).collect()
    assert len(rows) == N
    assert df.rdd.getNumPartitions() == WORKERS

    # Round-robin sharding: every row in a partition has the same residue.
    by_pid: dict[int, set[int]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, set()).add(r.slot % WORKERS)
    assert all(len(res) == 1 for res in by_pid.values())
    assert len(by_pid) == WORKERS

    # Payload parity with the file landing zone (same serialization).
    out_dir = str(tmp_path / "blocks")
    write_blocks_json(out_dir, n_blocks=N, seed=7, files=WORKERS)
    file_payloads = {
        r.value for r in spark.read.text(f"{out_dir}/blocks_*.json").collect()
    }
    assert {r.payload for r in rows} == file_payloads


def test_stream_drains_to_batch_result(spark, tmp_path):
    register_block_datasource(spark)
    stream = (
        spark.readStream.format("solana_blocks")
        .option("n_blocks", N)
        .option("n_workers", WORKERS)
        .option("first_slot", FIRST)
        .option("seed", 7)
        .option("blocks_per_batch", 5)  # 12 slots → 3 uneven micro-batches
        .option("max_slots", N)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.slot, r.payload)
        for r in spark.sql("select * from ds_stream_out").collect()
    )
    want = sorted((r.slot, r.payload) for r in _batch_df(spark).collect())
    assert got == want and len(got) == N


def test_stream_checkpoint_restart_no_dup_no_loss(spark, tmp_path):
    """ST6 on the custom source: stop the stream mid-range, restart from the
    checkpoint with a FRESH reader (frontier back at first_slot), and the
    drained total must still be exactly one row per slot — no duplicates
    from offset rewind, no losses from the frontier fast-forward."""
    register_block_datasource(spark)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def start(max_slots):
        stream = (
            spark.readStream.format("solana_blocks")
            .option("n_blocks", N)
            .option("n_workers", WORKERS)
            .option("first_slot", FIRST)
            .option("seed", 7)
            .option("blocks_per_batch", 4)
            .option("max_slots", max_slots)
            .load()
        )
        # Memory sinks don't support recovery; a file sink exercises the
        # real checkpointed-offset restart path.
        return (
            stream.select("slot").writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start(max_slots=8)        # first run: only 8 of the 12 slots exist
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out_dir).count() == 8

    q = start(max_slots=N)        # restart: the remaining slots arrive
    q.processAllAvailable()
    q.stop()
    slots = sorted(r.slot for r in spark.read.parquet(out_dir).collect())
    assert slots == list(range(FIRST, FIRST + N)), slots  # each exactly once


def test_datasource_feeds_extraction_chain(spark):
    df = _batch_df(spark)
    watch = spark.createDataFrame([(a,) for a in hot_addresses()], "address string")
    out = extract_balance_changes(parse_blocks(df, "payload"), watch)
    got = {
        (r.wallet, r.signature, r.mint, r.pre_balance, r.post_balance,
         int(r.ts.timestamp()))
        for r in out.collect()
    }
    assert got == python_oracle(generate_blocks(N, 7), set(hot_addresses()))
    assert len(got) > 0
