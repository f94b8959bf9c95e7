"""Structured Streaming ingest — the incremental path (SURVEY §2.8).

The reference's daily batch (cron → per-date Lambda fan-out) maps to a
file-source stream over the bronze directory with idempotent foreachBatch
merges into silver: each micro-batch replays the loader's set-oriented
normalize, and merge idempotence (operators/merge.py) makes reprocessing
safe — the Spark-native equivalent of the reference's at-least-once
Step Function retries against ON CONFLICT upserts.

Also provides watermarked windowed aggregation over the events stream —
the streaming twin of the batch ``events_hourly_rollup`` plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import EVENT_DTO


def read_bronze_stream(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """File-source stream of EventDTO JSON with the explicit schema — new
    files (one per scrape date in deployment) become micro-batches."""
    return (
        spark.readStream.schema(EVENT_DTO)
        .option("maxFilesPerTrigger", 8)
        .json(bronze_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "performance_time",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts with late-data handling: the watermark bounds
    state (at 100 TB/day of events, unbounded state is the first thing that
    kills a streaming job)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n")
    )


def start_silver_maintenance(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch loop: bronze micro-batch → normalize → overwrite silver
    snapshot. Parquet-overwrite keeps exactly-once semantics without a
    transactional table format (Delta MERGE slots in here when available)."""
    from ..pipeline.normalize import normalize

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        silver = normalize(batch_df)
        for name, df in silver.items():
            df.write.mode("overwrite").parquet(f"{silver_dir}/{name}/batch={batch_id}")

    return (
        read_bronze_stream(spark, bronze_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
