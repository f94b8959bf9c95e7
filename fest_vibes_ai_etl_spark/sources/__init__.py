from .tables import table, load_tables  # noqa: F401
