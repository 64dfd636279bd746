from .registry import QuerySpec, all_queries, all_oracles, get, register, sql_pair  # noqa: F401
