"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``      — flagship query on /root/testdata/sf0.001
- ``queries()``         — name → (spark, sf_dir) -> DataFrame, one entry per
                          implemented operator from SURVEY.md §2
- ``oracle_sql()``      — name → equivalent DuckDB SQL (omitted for
                          non-SQL-expressible ops → rows-only check)

All real logic lives in the ``fest_vibes_ai_etl_spark`` package; this module
just exposes its query catalog.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Importable regardless of the harness's cwd/sys.path.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from fest_vibes_ai_etl_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's canonical read path (SURVEY §3.4) reshaped
    onto the driver tables — date-filtered fact, 4-way dim join, per-order
    collect-list, deterministic ordering."""
    qs = catalog.queries()
    return qs["q_order_document"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
