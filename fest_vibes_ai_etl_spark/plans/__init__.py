from .catalog import REGISTRY, QuerySpec, queries, oracle_sql  # noqa: F401
