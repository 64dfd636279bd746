"""Bucketed co-located joins, observe() metrics, corrupt-block tolerance.

Three scale/robustness properties with no query-registry surface:

- Bucketing: pre-partitioned fact tables joined on the bucket column must
  plan ZERO shuffles on the join key — the strategy that amortizes one
  write-time shuffle across every subsequent join at 100 TB.
- observe(): the A3 matched-transaction counter
  (RECEIVER/parser_main.cpp:121,133) as zero-cost inline metrics instead of
  a second aggregation pass.
- Corrupt payloads must quarantine, not kill the pipeline (the reference
  skips bad blocks, RECEIVER/parser_main.cpp:92-97).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rugpull_data_pipeline_spark.operators.balance import (
    extract_balance_changes,
    parse_blocks,
)
from rugpull_data_pipeline_spark.sources.io import write_bucketed
from rugpull_data_pipeline_spark.sources.solana import (
    hot_addresses,
    write_blocks_json,
)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(tmp_path / "li_b"))
    write_bucketed(orders, "ord_b", "o_orderkey", 8, path=str(tmp_path / "ord_b"))

    joined = spark.table("li_b").join(
        spark.table("ord_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # Broadcast would hide the property at this scale — force the join to
    # resolve via bucketing by checking no shuffle exchange exists at all.
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 0, f"bucketed join still shuffles:\n{plan[:2000]}"
    assert joined.count() > 0
    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE ord_b")


def test_observe_matched_tx_metrics(spark, tmp_path):
    """A3 as observe(): count + hot-count ride the main pass for free."""
    blocks_dir = write_blocks_json(str(tmp_path / "blocks"), 10, 31, 2)
    blocks = parse_blocks(spark.read.text(f"{blocks_dir}/blocks_*.json"))
    watch = spark.createDataFrame([(a,) for a in hot_addresses()], "address string")

    from pyspark.sql import Observation

    obs = Observation("balance_metrics")
    observed = extract_balance_changes(blocks, watch).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        # observe() disallows DISTINCT aggregates — the sketch estimate is
        # the canonical inline-metrics choice.
        F.approx_count_distinct("signature").alias("n_txs_approx"),
    )
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    assert 0 < got["n_txs_approx"] <= n * 1.1


def test_corrupt_blocks_quarantined_not_fatal(spark, tmp_path):
    """A malformed block payload must not fail extraction — bad rows parse
    to null and drop out; good rows still extract (reference behavior:
    guard and skip, RECEIVER/parser_main.cpp:92-97)."""
    blocks_dir = write_blocks_json(str(tmp_path / "blocks"), 8, 33, 1)
    with open(f"{blocks_dir}/blocks_00.json", "a") as fh:
        fh.write("{definitely not json}\n")
        fh.write('{"result": null}\n')
        fh.write('{"result": {"blockTime": 1, "transactions": null}}\n')

    raw = spark.read.text(f"{blocks_dir}/blocks_*.json")
    watch = spark.createDataFrame([(a,) for a in hot_addresses()], "address string")
    out = extract_balance_changes(parse_blocks(raw), watch)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.signature is not None for r in rows)
