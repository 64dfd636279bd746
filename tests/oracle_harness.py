"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
then compares row count, column names/order-insensitive values the way the
driver does (sort columns by name, sort rows, exact value equality).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from rugpull_data_pipeline_spark.sources.tables import TABLES

__all__ = ["run_oracle", "compare", "check_query"]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = _normalize(spark_df), _normalize(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            sa, sb = a[c], b[c]
            if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
                neq = ~(
                    (sa.isna() & sb.isna())
                    | (sa == sb)
                )
            else:
                neq = ~((sa.isna() & sb.isna()) | (sa.astype(str) == sb.astype(str)))
            n_bad = int(neq.sum())
            if n_bad:
                idx = neq[neq].index[:3]
                examples = [
                    f"row {i}: spark={sa[i]!r} duck={sb[i]!r}" for i in idx
                ]
                problems.append(f"column {c}: {n_bad} mismatched values; " + "; ".join(examples))
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from rugpull_data_pipeline_spark.plans import registry

    spec = registry.get(name)
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    ddf = run_oracle(spec.oracle, sf_dir)
    return compare(sdf, ddf)
