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


def events_time_range(
    spark: SparkSession, sf_dir: str, start_iso: str, end_iso: str
) -> DataFrame:
    """Events with ``start <= ts < end``, with the range predicate pushed to
    the parquet scan.

    A filter written against the *converted* timestamp column sits above a
    Project and never reaches the scan (only IsNotNull pushes). Translating
    the bounds to raw nanos and filtering the bigint column first makes the
    range a ``PushedFilters`` row-group predicate — the difference between a
    pruned scan and a full 100 TB scan on a time-partitioned fact table."""
    import datetime as dt

    def ns(s: str) -> int:
        d = dt.datetime.fromisoformat(s)
        return int(d.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000_000

    configure(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") != "bigint":  # already µs timestamps
        return raw.filter(
            (F.col("ts") >= F.lit(start_iso).cast("timestamp"))
            & (F.col("ts") < F.lit(end_iso).cast("timestamp"))
        )
    return raw.filter(
        (F.col("ts") >= F.lit(ns(start_iso))) & (F.col("ts") < F.lit(ns(end_iso)))
    ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
