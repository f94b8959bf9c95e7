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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to canonical ``TimestampType`` across
    every physical form the testdata has shipped in:

    - ``bigint``: parquet TIMESTAMP(NANOS) read via legacy.parquet.nanosAsLong
      → integer-divide to µs (``div`` keeps long arithmetic; ``/`` would
      round-trip through double and lose precision above 2^53).
    - ``timestamp_ntz``: parquet ``timestamp[us]`` with isAdjustedToUTC=false
      (Spark 4 reads it as TIMESTAMP_NTZ, on which ``unix_micros`` and
      ``withWatermark`` both throw) → cast to TIMESTAMP. The session TZ is
      pinned to UTC (session.configure), so the NTZ→LTZ cast is a value
      identity and matches DuckDB's naive-timestamp oracle semantics.
    - ``timestamp``: already canonical.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` — filters/projections
    applied by callers reach the scan via Catalyst pushdown.

    ``events.ts`` is normalized to canonical ``TimestampType`` regardless of
    the parquet physical type (see :func:`normalize_event_ts`)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
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
    dtype = dict(raw.dtypes).get("ts")
    if dtype == "bigint":  # TIMESTAMP(NANOS): filter raw longs, then convert
        return raw.filter(
            (F.col("ts") >= F.lit(ns(start_iso))) & (F.col("ts") < F.lit(ns(end_iso)))
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":  # filter in NTZ so the range pushes to the
        # scan (comparing against a cast column would sit above a Project),
        # then cast once — identity under the UTC session TZ.
        return raw.filter(
            (F.col("ts") >= F.lit(start_iso).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(end_iso).cast("timestamp_ntz"))
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.filter(
        (F.col("ts") >= F.lit(start_iso).cast("timestamp"))
        & (F.col("ts") < F.lit(end_iso).cast("timestamp"))
    )
