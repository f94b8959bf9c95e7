from . import gold, normalize  # noqa: F401
