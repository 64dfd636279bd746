"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 (plus the LLM-pipeline additions) registers
here as a named query: a builder ``(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, a DuckDB oracle string over the same parquet tables.
``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

BuilderFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Track which sf_dir the current session's temp views point at, so repeated
# query invocations don't re-read parquet metadata needlessly.
_VIEWS_FOR: dict[int, str] = {}


def _ensure_views(spark: SparkSession, sf_dir: str) -> None:
    key = id(spark)
    if _VIEWS_FOR.get(key) != sf_dir:
        register_views(spark, sf_dir)
        _VIEWS_FOR[key] = sf_dir


@dataclass
class QuerySpec:
    name: str
    builder: BuilderFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[BuilderFn], BuilderFn]:
    """Decorator: register a python builder (DataFrame-API query)."""

    def deco(fn: BuilderFn) -> BuilderFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_views(spark, sf_dir)
            return fn(spark, sf_dir)

        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, tags, doc or fn.__doc__ or "")
        return fn

    return deco


def sql_pair(
    name: str,
    spark_sql: str,
    duck_sql: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> None:
    """Register a query given as Spark SQL text + DuckDB oracle text.

    When ``duck_sql`` is None the spark text is reused verbatim (the dialects
    agree for plain ANSI).
    """

    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_views(spark, sf_dir)
        return spark.sql(spark_sql)

    _REGISTRY[name] = QuerySpec(
        name, builder, duck_sql if duck_sql is not None else spark_sql, tags, doc
    )


def get(name: str) -> QuerySpec:
    _load_plan_modules()
    return _REGISTRY[name]


# Queries deliberately RE-verified this round despite an existing green
# driver row — the oldest-first re-proof cadence (their last driver row is
# round 2, the stalest tier). The rotation test treats window slots as
# legal iff they are either never-driver-green or named here, so a freshly
# graded CORRECTNESS file can never redden the suite (round-6 verdict
# item 2). Keep this list in sync with the re-proof slots below.
REPROOF: tuple[str, ...] = (
    "agg_conditional_pre_post",
    "agg_cube_flag_status",
    "agg_distinct_per_type",
    "agg_last_value_per_key",
    "agg_rollup_region_nation",
    "dedup_exact_pairs",
    "flagship_balance_report",
    "join_anti_customers_no_orders",
    "join_full_outer_nations",
    "join_left_outer_orders",
    "join_semi_parts_in_lineitem",
)

# The grading driver verifies the FIRST 50 queries in `queries()` iteration
# order against their DuckDB oracles each round. Rounds 2–6 verified 248
# distinct queries (CORRECTNESS_r02..r06, 248 green / 0 standing red).
# Round 7 clears the backlog entirely: the 38 queries that have never had
# a CORRECTNESS row (authoritative set computed by tools/rotation_plan.py
# as set(all_queries()) − union(CORRECTNESS_r02..r06 hash-green keys))
# plus 12 oldest-first RE-PROOFS from the round-2 relational/TPC-H tier —
# the start of the standing re-proof cadence (oldest driver row first).
# Everything NOT listed keeps registration order behind these, so
# already-green queries still run when the driver checks more than 50.
DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- 38-query backlog (never driver-checked before round 7) ----
    # Text remainder.
    "text_bigram_kneser_ney",
    "text_whitespace_normalize",
    "text_zipf_fit",
    # Sampling remainder.
    "sample_class_rebalance",
    "sample_group_holdout",
    "sample_stratified_neyman",
    "sample_bootstrap_hash",
    # Data-profiling family.
    "profile_drift_psi",
    "profile_drift_ks",
    "profile_benford_screen",
    "profile_moments_skew_kurtosis",
    "profile_freq_of_freq",
    "profile_simpson_paradox",
    "profile_jsd_source_drift",
    "profile_heaps_law",
    "profile_completeness_nulls",
    # Storage-layout advisors.
    "layout_partition_skew_advisor",
    "layout_vacuum_plan",
    "layout_manifest_prune",
    # Event-sequence analytics.
    "events_markov_stationary",
    "events_survival_km",
    "events_interarrival_stats",
    "events_entropy_rate",
    "events_rfm_segments",
    # Time-series window analytics.
    "window_running_distinct_types",
    "window_rolling_median",
    "window_acf_lags",
    "window_seasonal_baseline",
    "window_theil_sen",
    "window_pettitt_changepoint",
    "window_vpin_toxicity",
    "window_ljung_box",
    "window_crosscorr_leadlag",
    "window_mann_kendall",
    "window_hurst_rs",
    "window_perm_entropy",
    "window_holt_linear",
    # Dataset documentation.
    "traindata_dataset_card",
    # ---- round-7 debut: the end-to-end streaming composition (it sits
    # INSIDE its debut window, so the never-checked set stays empty; one
    # re-proof slot yielded to it — 38 backlog + this + 11 re-proofs = 50) ----
    "stream_flagship_e2e_replay",
) + REPROOF
# Round-7 rotation state: backlog cleared — after a green r7 window every
# one of the 286 registered queries has at least one driver CORRECTNESS
# row. From round 8 on the window is pure re-proof cadence: take the 50
# stalest rows oldest-round-first (tools/rotation_plan.py computes the
# staleness order; the r2 tier has 37 rows left after this window, then
# r3's 49). Registry growth unfreezes once the r7 window is green (the
# round-5 commitment is satisfied); new registrations must sit INSIDE
# their debut window so the never-checked set stays empty. Mitigation
# already banked: every query in the registry is locally hash-verified
# against its DuckDB oracle at sf0.01 AND sf0.1 (SCALE.md sweeps), so a
# stale driver row does not mean unverified code.


def _ordered() -> list[tuple[str, QuerySpec]]:
    _load_plan_modules()
    prio = [
        (n, _REGISTRY[n]) for n in DRIVER_PRIORITY if n in _REGISTRY
    ]
    seen = set(DRIVER_PRIORITY)
    rest = [(n, s) for n, s in _REGISTRY.items() if n not in seen]
    return prio + rest


def all_queries() -> dict[str, BuilderFn]:
    return {name: spec.builder for name, spec in _ordered()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _ordered() if spec.oracle is not None
    }


_LOADED = False


def _load_plan_modules() -> None:
    """Import the plan modules exactly once (they register on import)."""
    global _LOADED
    if _LOADED:
        return
    from . import relational  # noqa: F401
    from . import tpch_shapes  # noqa: F401
    from . import spark4_features  # noqa: F401
    from . import semi_structured  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import domain  # noqa: F401
    from . import advanced  # noqa: F401
    from . import multimodal_q  # noqa: F401
    from . import curation  # noqa: F401
    from . import corpus_ops  # noqa: F401
    from . import quality_ops  # noqa: F401
    from . import stream_infra  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import mlprep_ops  # noqa: F401
    from . import traindata_ops  # noqa: F401
    from . import stats_eval  # noqa: F401
    from . import feature_ops  # noqa: F401
    from . import mining_ops  # noqa: F401

    _LOADED = True
