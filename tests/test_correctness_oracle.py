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
    round-6 rotation must fill that window exclusively with queries that
    have never had a green CORRECTNESS row (computed from the recorded
    r02–r05 files, the authoritative source — comments have drifted
    before), must include the named high-value rows, and every priority
    name must really exist."""
    names = list(registry.all_queries())
    unknown = [n for n in registry.DRIVER_PRIORITY if n not in names]
    assert not unknown, f"priority list names unknown queries: {unknown}"
    window = set(names[:50])
    required = {
        # S11 console sink — the last SURVEY §2 row without a driver record
        "console_head10",
        # round-5 stateful streaming replays
        "stream_kalman_filter",
        "stream_psi_drift_replay",
        "stream_cms_topk_replay",
        "stream_hopping_window_replay",
        # sketch/ANN accuracy audits
        "audit_ann_recall",
        "audit_lsh_band_sensitivity",
        "audit_multiprobe_recall",
        # incremental dedup + scale-shaped sampling
        "dedup_minhash_incremental",
        "sample_kcenter_coreset",
        # graph + Spark-4 scripting
        "graph_hits_power3",
        "graph_triangle_count",
        "spark4_sql_scripting",
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
    # next rotations. After the round-6 window (49 backlog slots + the new
    # console_head10) the carry-over is 38 — round 7 absorbs all of it
    # plus 12 oldest-first re-proofs, clearing the backlog. The hard cap
    # stays at 90 (two 50-slot rotations), but registry growth is frozen
    # until the r7 window is green, so the carry must also satisfy the
    # round-5 verdict's tighter ≤ 40 bar.
    never = set(names) - seen
    carried = never - window
    assert len(carried) <= 40, f"carry-over too large: {sorted(carried)}"


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
