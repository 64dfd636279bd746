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


def all_queries() -> dict[str, BuilderFn]:
    _load_plan_modules()
    return {name: spec.builder for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_plan_modules()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
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

    _LOADED = True
