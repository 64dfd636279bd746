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


def static_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """View-first gated fixture-table load for DataFrame builders.

    The registered temp view is used ONLY when this registry's view cache
    says the session's views point at THIS sf_dir; otherwise the table is
    loaded straight from the requested directory. Registered builders always
    run behind ``_ensure_views`` so the view path is the common case — the
    gate exists for DIRECT callers (tests importing a builder function)
    whose session may hold views for a different directory, which once made
    a builder silently compute against a stale fixture (round-7 ADVICE on
    ``_flagship_e2e``; generalized here per the round-8 verdict so no
    DataFrame builder reads ``spark.table`` bare)."""
    try:
        if _VIEWS_FOR.get(id(spark)) == sf_dir and spark.catalog.tableExists(name):
            return spark.table(name)
    except Exception:  # noqa: BLE001 - catalog probe must never mask the load
        pass
    from ..sources.tables import load_tables

    return load_tables(spark, sf_dir, (name,))[name]


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
# driver row — the oldest-first re-proof cadence. Round 10 takes the 25
# stalest rows: join_cross_region_bands (the r9 carry — its slot went to
# the stream_price_maint_tws debut: coverage first, staleness second)
# plus the 24 next-stalest round-3 rows (staleness order computed by
# tools/rotation_plan.py from the recorded CORRECTNESS artifacts; 13 r3
# rows remain for round 11). The rotation test treats window slots as
# legal iff they are either never-driver-green or named here, so a
# freshly graded CORRECTNESS file can never redden the suite; the
# 25-entry cap (tests/test_correctness_oracle.py) keeps the re-proof
# fraction bounded, which is why the registry again grew by 25 genuinely
# new queries this round (the standing window arithmetic: backlog 0 +
# 50 slots + REPROOF <= 25).
REPROOF: tuple[str, ...] = (
    # Round-11 re-proof slots: the FINAL 13 round-3 rows (after this
    # window every query in the registry is driver-green r4 or later;
    # the r4 tier becomes the stalest for round 12 — see
    # tools/rotation_plan.py).
    "text_corpus_curation",  # last green r3
    "text_fingerprint",  # last green r3
    "text_lang_id_heuristic",  # last green r3
    "text_mixture_sample",  # last green r3
    "text_pack_sequences",  # last green r3
    "text_quality_score",  # last green r3
    "text_tfidf_topterms",  # last green r3
    "text_token_bpe_regex",  # last green r3
    "text_token_count",  # last green r3
    "text_train_val_split",  # last green r3
    "text_vocab_topk",  # last green r3
    "udf_arrowmap_vecsum",  # last green r3
    "udf_groupmap_minmax_scale",  # last green r3
)

# The grading driver verifies the FIRST 50 queries in `queries()` iteration
# order against their DuckDB oracles each round. Cumulative record through
# round 10: 363 distinct queries verified, 363 green, 0 standing red
# (CORRECTNESS_r02..r10), plus the 12 queries banked in round 10
# (plans/insights_ops.py — judge/oracle/matrix-verified, never
# driver-checked). The round-11 window = those 12 BANKED rows + the 25
# queries that DEBUT this round (the forensics/robustness tiers of
# plans/forensics_ops.py and plans/robustness_ops.py, registered inside
# their debut window) + the 13 oldest-first RE-PROOFS above (the final r3
# rows) = exactly 50. Everything NOT listed keeps registration order
# behind these, so already-green queries still run when the driver checks
# more than 50.
DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- round-10 banked backlog (insights_ops): first driver check ----
    "window_anomalous_days",
    "window_pacf_lag2",
    "events_user_overlap_types",
    "events_weekday_weekend_lift",
    "eval_cliffs_delta",
    "text_stopword_profile",
    "text_char_class_profile",
    "profile_pk_uniqueness",
    "agg_lorenz_deciles",
    "sim_centroid_separation",
    "graph_degree_gini",
    "dedup_doc_family_sizes",
    # ---- round-11 debuts: fraud/AML forensics (forensics_ops) ----
    "profile_structuring_screen",
    "profile_last_digit_uniformity",
    "profile_duplicate_billing",
    "profile_dormant_reactivation",
    "profile_lognormal_fit",
    "window_pump_dump_pattern",
    "window_squarewave_period",
    "window_unit_root_df",
    "window_risk_ratios",
    "window_market_beta",
    "agg_hill_tail_index",
    "eval_anova_oneway",
    "eval_levene_bf",
    # ---- round-11 debuts: rank tests / sketch audits / corpus
    # forensics (robustness_ops) ----
    "eval_mann_whitney_u",
    "eval_rank_biased_overlap",
    "eval_concordance_index",
    "audit_quantile_sketch",
    "audit_distinct_sketch",
    "text_token_novelty",
    "text_burrows_delta",
    "text_keyphrase_rake",
    "graph_edge_reciprocity",
    "graph_rich_club",
    "events_cohort_ltv",
    "sample_pps_systematic",
) + REPROOF


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
    from . import analytics_ops  # noqa: F401
    from . import diagnostics_ops  # noqa: F401
    from . import insights_ops  # noqa: F401
    from . import forensics_ops  # noqa: F401
    from . import robustness_ops  # noqa: F401
    from . import screening_ops  # noqa: F401

    _LOADED = True
