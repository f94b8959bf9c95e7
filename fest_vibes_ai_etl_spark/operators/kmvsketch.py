"""K-minimum-values (KMV) distinct sketches — mergeable AND intersectable.

The HLL layer (plans/sketches.py) answers per-group distinct counts with
mergeable union, but HLL cannot estimate INTERSECTIONS without lossy
inclusion-exclusion. KMV (Bar-Yossef et al. 2002; the core of Apache
DataSketches' theta sketch) can: keep the k smallest hash values of a set;
the (k−1)/kth-minimum estimator gives |S|, trimmed unions stay KMV, and
the fraction of the union's k-set that lands in BOTH input sets estimates
the Jaccard — multiplying out gives |A ∩ B|. That makes audience-overlap
questions ("users who did X and also did Y") answerable from pre-built
per-segment sketches without rescanning the fact table.

Engine shape: hash → per-group distinct → k-smallest via the JVM
WindowGroupLimit path (``row_number() ≤ k`` is rank-limit-pushdown
eligible, so the shuffle carries at most k rows per group per partition).
The hash is the portable md5-60 (operators/dedup.md5_token_hash60), so
every estimate is DETERMINISTIC and bit-reproducible in DuckDB SQL — the
catalog oracles replicate the sketch exactly rather than bounding it.

Scale: a k=64 sketch is ≤ 512 bytes per group regardless of set size;
building it is one distinct + one pruned ranking; merging persisted
sketches is array arithmetic on ≤ 2k values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from .dedup import md5_token_hash60

TWO_POW_60 = float(1 << 60)


def kmv_hash(col: Column) -> Column:
    """Portable 60-bit hash of any key column (cast to string first)."""
    return md5_token_hash60(col.cast("string"))


def k_smallest_hashes(
    df: DataFrame, group_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """(group…, h, rn) — the k smallest distinct key hashes per group.
    distinct → row_number ≤ k: the rank-limit pushdown prunes map-side."""
    hashed = df.select(*group_cols, kmv_hash(F.col(key_col)).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    )


def kmv_estimate(kset: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group…, n_distinct_est). Exact when the set has fewer than k
    members (the sketch IS the set); else (k−1)/(kth_min/2⁶⁰)."""
    agg = kset.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("kth")
    )
    est = F.when(F.col("cnt") < k, F.col("cnt").cast("double")).otherwise(
        round_div(F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("kth"), 4)
    )
    return agg.select(*group_cols, est.alias("n_distinct_est"))


def kmv_intersection(
    a: DataFrame, b: DataFrame, k: int
) -> DataFrame:
    """One-row (union_est, jaccard_est, intersection_est) from two k-sets
    (columns: h, rn). X = k smallest of A ∪ B; ρ = |X ∩ A ∩ B|/|X|;
    |A∩B| ≈ ρ · |A∪B|. All arithmetic on ≤ 2k rows — broadcastable."""
    ua = a.select("h")
    ub = b.select("h")
    union_k = (
        ua.unionByName(ub).distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= k)
    )
    in_both = (
        union_k.join(ua, "h", "left_semi").join(ub, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("rho_n"))
    )
    stats = union_k.agg(
        F.count(F.lit(1)).alias("xn"), F.max("h").alias("kth")
    )
    union_est = F.when(F.col("xn") < k, F.col("xn").cast("double")).otherwise(
        round_div(F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("kth"), 4)
    )
    return (
        stats.crossJoin(F.broadcast(in_both))
        .select(
            union_est.alias("union_est"),
            round_div(F.col("rho_n") / F.col("xn"), 4).alias("jaccard_est"),
            "xn", "rho_n",
        )
        .select(
            "union_est",
            "jaccard_est",
            round_div(F.col("rho_n") / F.col("xn") * F.col("union_est"), 4).alias(
                "intersection_est"
            ),
        )
    )
