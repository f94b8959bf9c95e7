"""Explicit-schema batch readers/writers for the non-parquet interchange
formats the pipeline touches: JSON lines (the reference's S3 bronze format,
S4/S5) and CSV (operator-facing exports). Schema is ALWAYS supplied — schema
inference is a full extra pass over the data at 100 TB and is
non-deterministic under sampling, so it is banned here the same way the
reference hydrates DTOs from explicit dataclasses
(/root/reference/src/shared/dto/event_dto.py).

Readers accept either a StructType or a DDL string. Writers default to a
single compact layout knob (`coalesce`) because interchange files are small
exports; big data stays in partitioned parquet (sources/lakehouse.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    timestamp_format: str | None = None,
) -> DataFrame:
    """JSON-lines with an explicit schema. Corrupt records are captured, not
    fatal: PERMISSIVE + `_corrupt_record` keeps the bad-row quarantine
    pattern (P8) available to callers instead of failing the whole read."""
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with an explicit schema (never inferSchema: one pass, stable types)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, coalesce: int | None = None) -> None:
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").option("header", str(header).lower()).csv(path)
