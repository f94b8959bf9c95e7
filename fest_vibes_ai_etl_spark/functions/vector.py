"""Vector column expressions — dot product / norms / cosine, JVM-side.

The reference stores 384-dim pgvector embeddings with HNSW cosine indexes
(/root/reference/src/shared/db/database.py:202-210); the query capability that
implies is cosine top-k. Here vectors are ``array<float>`` columns and the
math is built-in higher-order functions (``zip_with`` + ``aggregate``), which
run inside codegen — no Python in the hot path. Elements are cast to double
before accumulation so results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Pre-normalize vectors once at write time; cosine then reduces to a dot
    product — at 100 TB this halves the per-pair flops and lets the stored
    corpus skip per-query norm recomputation."""
    n = norm(a)
    return F.transform(a, lambda v: v.cast("double") / n)
