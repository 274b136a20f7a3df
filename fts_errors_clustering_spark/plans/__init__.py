from .registry import QueryDef, all_queries, oracle_sql, queries, register  # noqa: F401
