from .registry import QUERIES, oracle_sql, queries  # noqa: F401
