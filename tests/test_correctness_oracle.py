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
    round-5 rotation must fill that window exclusively with queries that
    have never had a green CORRECTNESS row (computed from the recorded
    r02–r04 files, the authoritative source — comments have drifted
    before), must include the named high-value rows, and every priority
    name must really exist."""
    names = list(registry.all_queries())
    unknown = [n for n in registry.DRIVER_PRIORITY if n not in names]
    assert not unknown, f"priority list names unknown queries: {unknown}"
    window = set(names[:50])
    required = {
        # the last never-driver-green SURVEY §2 row (S10)
        "stream_control_gated_replay",
        # omitted from every pre-round-5 candidate list
        "q20_potential_promotion",
        # round-4b stateful streaming replays
        "stream_cusum_alert",
        "stream_bollinger_alert",
        "stream_attribution_replay",
        # multimodal kernels with the byte-exact oracles
        "multimodal_resize_batch",
        "multimodal_window_energy",
        # Spark-4 trio + ANN scale path
        "spark4_exec_immediate_params",
        "sim_ivfpq_topk",
        # changed this round — must re-earn its driver row
        "sample_temporal_split",
    }
    assert required <= window, f"missing from driver window: {required - window}"
    import glob as _glob
    import json as _json
    import os as _os

    seen = set()
    base = _os.path.join(_os.path.dirname(__file__), "..")
    for path in sorted(_glob.glob(_os.path.join(base, "CORRECTNESS_r0*.json"))):
        with open(path) as fh:
            rows = _json.load(fh)
        seen |= {k for k, v in rows.items() if v.get("hash_match")}
    already_green = window & seen
    assert not already_green, (
        f"window slots wasted on already-green queries: {sorted(already_green)}"
    )
    # Everything never-checked and NOT in the window is carried to the
    # next rotations. Round 5 added a ~20-query eval/statistics tier after
    # its window was (correctly) frozen on the round-4b backlog, so the
    # carry-over is allowed to span TWO future 50-slot rotations — round 6
    # takes the 45 highest-value carried queries + 5 oldest-first
    # re-proofs, round 7 absorbs the remainder — but it must never exceed
    # that (90), or the backlog would start compounding faster than the
    # driver can verify it.
    never = set(names) - seen
    carried = never - window
    assert len(carried) <= 90, f"carry-over too large: {sorted(carried)}"


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
