"""Every registered query must hash-match its DuckDB oracle (driver mirror)."""

from __future__ import annotations

import pytest

from rugpull_data_pipeline_spark.plans import registry

from .oracle_harness import check_query

registry._load_plan_modules()
ALL_NAMES = sorted(registry._REGISTRY.keys())


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) == 8


def test_registry_coverage(spark):
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    assert len(qs) >= 20, f"only {len(qs)} queries registered"
    missing = set(qs) - set(oracles)
    # every query should have an oracle unless explicitly non-SQL-expressible
    for name in missing:
        assert "nosql" in registry.get(name).tags, f"{name} lacks an oracle"


def test_driver_window_rotation():
    """The driver verifies the first 50 queries in iteration order. The
    round-4 rotation must put the never-yet-driver-checked queries (plus
    round 3's one red row and the new streaming-infra replays) inside that
    window, and every priority name must really exist."""
    names = list(registry.all_queries())
    unknown = [n for n in registry.DRIVER_PRIORITY if n not in names]
    assert not unknown, f"priority list names unknown queries: {unknown}"
    window = set(names[:50])
    required = {
        "join_range_time_window",
        "window_lead_range_frame",
        "kmeans_lloyd_fit",
        "sim_pq_encode",
        "stream_dim_upsert_replay",
        "stream_checkpoint_restart",
        "stream_watermark_append",
        "lookup_batched_mapinpandas",
        "json_size_guard_quarantine",
    }
    assert required <= window, f"missing from driver window: {required - window}"
    # Round 4 closes the loop: with r2+r3 green retained, every name in the
    # window must be one that has never had a green CORRECTNESS row.
    import json as _json
    import os as _os

    seen = set()
    for fname in ("CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        path = _os.path.join(_os.path.dirname(__file__), "..", fname)
        if _os.path.exists(path):
            with open(path) as fh:
                rows = _json.load(fh)
            seen |= {k for k, v in rows.items() if v.get("hash_match")}
    already_green = window & seen
    assert not already_green, (
        f"window slots wasted on already-green queries: {sorted(already_green)}"
    )


def test_every_oracle_runs_standalone_in_duckdb(sf_dir):
    """The driver may execute oracle SQL BEFORE any Spark builder runs, in a
    fresh process. Every oracle must therefore be valid, runnable DuckDB SQL
    on its own (generated corpora are materialized at plan-module import,
    which this test exercises by importing the registry first)."""
    import duckdb

    from rugpull_data_pipeline_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name, sql in registry.all_oracles().items():
        try:
            con.execute(sql).fetchone()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {ex}")
    con.close()
    assert not failures, "\n".join(failures)
