"""Focused tests for the round-12 optimization refactors.

Each test pins an operator-internal equivalence the optimization relies
on, independently of the (slower, registry-level) oracle gate:

1. The fused pre/post explode in ``extract_balance_changes`` must produce
   the same relation as the old union-of-two-explodes on every edge the
   union handled row-by-row (null arrays, empty arrays, null elements).
2. ``_lsh_buckets_df`` (plane signs folded in as literals, one agg) must
   equal the SQL twin ``_lsh_buckets`` the oracle runs — including on a
   degenerate corpus with empty embeddings, null elements and an
   all-null vector.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _old_entries(tx):
    """The pre-round-12 union-of-two-explodes phase expansion."""

    def _phase(col, tag):
        return tx.select(
            "ts",
            "signature",
            F.lit(tag).alias("phase"),
            F.explode_outer(F.col(col)).alias("b"),
        ).where(F.col("b").isNotNull())

    return _phase("pre", "pre").unionByName(_phase("post", "post"))


def _new_entries(tx):
    """The fused single-generator phase expansion (operators/balance.py)."""

    def _tagged(col, tag):
        return F.transform(
            F.coalesce(F.col(col), F.array()),
            lambda b: F.struct(F.lit(tag).alias("phase"), b.alias("b")),
        )

    return (
        tx.select(
            "ts",
            "signature",
            F.explode(
                F.concat(_tagged("pre", "pre"), _tagged("post", "post"))
            ).alias("e"),
        )
        .where(F.col("e.b").isNotNull())
        .select(
            "ts", "signature", F.col("e.phase").alias("phase"), F.col("e.b").alias("b")
        )
    )


def test_fused_phase_explode_matches_union(spark):
    bal = "array<struct<accountIndex:int,mint:string,owner:string>>"
    rows = [
        # both sides populated
        ("s1", [(0, "m1", "o1"), (1, "m2", "o2")], [(0, "m1", "o1")]),
        # null pre, empty post
        ("s2", None, []),
        # null element inside the array (explode_outer emits then filter drops)
        ("s3", [None, (2, "m3", "o3")], None),
        # empty both
        ("s4", [], []),
    ]
    tx = spark.createDataFrame(
        [(None, s, p, q) for (s, p, q) in rows],
        f"ts timestamp, signature string, pre {bal}, post {bal}",
    )
    old = _old_entries(tx).selectExpr(
        "signature", "phase", "b.accountIndex", "b.mint", "b.owner"
    )
    new = _new_entries(tx).selectExpr(
        "signature", "phase", "b.accountIndex", "b.mint", "b.owner"
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    assert old.schema == new.schema


def test_lsh_buckets_df_matches_sql_twin(spark, sf_dir):
    from rugpull_data_pipeline_spark.plans import registry
    from rugpull_data_pipeline_spark.plans.stats_eval import (
        _lsh_buckets,
        _lsh_buckets_df,
    )
    from rugpull_data_pipeline_spark.functions.scalars import SPARK

    registry._ensure_views(spark, sf_dir)
    sql_rows = sorted(map(tuple, spark.sql(_lsh_buckets(SPARK)).collect()))
    df_rows = sorted(map(tuple, _lsh_buckets_df(spark, sf_dir).collect()))
    assert sql_rows == df_rows
    assert len(sql_rows) > 0


def test_lsh_buckets_df_matches_sql_twin_degenerate(spark):
    # empty embedding (absent from buckets), null elements (skipped by SUM),
    # all-null vector (NULL sums -> bit 0 on every plane), plus a normal row
    from rugpull_data_pipeline_spark.plans.stats_eval import (
        _lsh_buckets,
        _lsh_buckets_df,
    )
    from rugpull_data_pipeline_spark.functions.scalars import SPARK
    from rugpull_data_pipeline_spark.plans import registry

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.25, 1.0], 0),
            (2, [], 0),
            (3, [None, 2.0, None], 0),
            (4, [None, None], 0),
            (5, [-1e-9, 1e-9], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    df.createOrReplaceTempView("embeddings")
    # direct the view-gated loader at the temp view we just registered
    registry._VIEWS_FOR[id(spark)] = "__opt_r12_degenerate__"
    try:
        sql_rows = sorted(map(tuple, spark.sql(_lsh_buckets(SPARK)).collect()))
        df_rows = sorted(
            map(
                tuple,
                _lsh_buckets_df(spark, "__opt_r12_degenerate__").collect(),
            )
        )
    finally:
        registry._VIEWS_FOR.pop(id(spark), None)
    assert sql_rows == df_rows
    # vec 2 absent (no exploded rows), vecs 1/3/4/5 present
    assert [r[0] for r in df_rows] == [1, 3, 4, 5]
