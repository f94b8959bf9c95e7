"""Sketch aggregates — the approximate layer a 100 TB engine needs when
exact distinct/quantile computation would shuffle the world:

- Apache DataSketches HLL via Spark's ``hll_sketch_agg`` — per-group
  distinct estimates whose partial states are *mergeable*: partitions build
  local sketches, the shuffle moves ~1.5 KB per group instead of one row
  per distinct key, and ``hll_union_agg`` re-aggregates coarse sketches to
  coarser groupings WITHOUT rescanning the fact (tested in
  tests/test_sketches.py).
- ``approx_percentile`` (KLL-style) for latency-distribution quantiles.

Rows-only correctness (DuckDB's HLL/quantile implementations differ, so no
value oracle exists); the tests bound the estimates against exact answers
computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table
from .catalog import register


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """(day, user_sketch) — one mergeable HLL sketch per day. This is the
    reusable partial: persist it once, answer distinct-users for any date
    range by unioning sketches instead of rescanning events."""
    return (
        events.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("user_sketch"))
    )


@register(
    "sketch_hll_daily_users",
    tags=("sketch", "approx", "hll"),
    bench=True,
)
def sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day via DataSketches HLL (lgK=12 ⇒ <1% typical
    error). Map-side partial sketches mean the shuffle carries one sketch
    per (partition, day) — constant bytes per group no matter how many
    events or users, which is the whole point at 100 TB."""
    events = table(spark, sf_dir, "events")
    return (
        daily_user_sketches(events)
        .select("day", F.hll_sketch_estimate("user_sketch").alias("approx_users"))
        .orderBy("day")
    )


@register(
    "sketch_quantiles_by_type",
    tags=("sketch", "approx", "quantile"),
)
def sketch_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of event value per event_type via approx_percentile —
    bounded-memory quantiles with mergeable partial state (vs exact
    percentile_disc, which needs a per-group sort). accuracy=10000 keeps
    rank error ≤ 1/10000."""
    events = table(spark, sf_dir, "events")
    pct = F.approx_percentile(
        "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
    )
    return (
        events.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_heavy_hitter_tokens",
    tags=("sketch", "approx", "frequency"),
)
def sketch_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy-hitter tokens over the document corpus: top-10
    candidates with their merged lower-bound counts and the global
    undercount bound (operators/freqsketch.py). k=48 exceeds the corpus
    vocabulary, so the sketch sits in its graceful-exact regime (D=0,
    counts exact) while still paying only k·#partitions shuffle rows; the
    lossy regime (k below vocabulary — est ≤ true ≤ est+D, completeness
    above D) is pinned in tests/test_sketches.py. Rows-only: estimates
    under decrement pressure depend on partition boundaries, so no SQL
    oracle reproduces them."""
    from ..operators.freqsketch import heavy_hitter_tokens

    docs = table(spark, sf_dir, "documents")
    return heavy_hitter_tokens(docs, "text", k=48, topn=10)
