"""Parquet lakehouse table access.

Corresponds to the reference's sources/sinks (SURVEY §2.1): the reference
reads S3 JSON + Postgres rows; this engine standardizes on parquet scans so
Catalyst gets predicate pushdown, column pruning and partition pruning for
free (reference had none of these — see SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` — filters/projections
    applied by callers reach the scan via Catalyst pushdown.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark 4 has no native
    type for; it is read as nanos-since-epoch (legacy.parquet.nanosAsLong)
    and converted to a µs TimestampType with integer division (``div`` keeps
    long arithmetic — ``/`` would round-trip through double and lose
    precision above 2^53)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
