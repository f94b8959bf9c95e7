"""Vector similarity search over ``array<float>`` embedding columns.

The reference declares HNSW cosine indexes (/root/reference/src/shared/db/
database.py:202-210) — the implied capability is cosine top-k. Spark has no
HNSW; the scale-correct designs are:

- **brute-force top-k** (baseline, exact): broadcast the query set, compute
  cosine JVM-side (zip_with/aggregate — no Python), rank per query with a
  window. Cost O(|Q|·|corpus|) — right answer for |Q| small, any corpus size,
  because the corpus scan is embarrassingly parallel and never shuffles the
  corpus itself (only |Q|·k rows shuffle for the final top-k).
- **pairwise near-dup** above a threshold: corpus self-join; at scale, gate
  it with the LSH bucketing below.
- **random-hyperplane LSH bucketing** (approximate scale path): b-bit sign
  signatures from deterministic pseudo-random hyperplanes (seeded hash in
  lieu of a Gaussian sample — fully reproducible, no driver-side RNG state);
  candidates collide on signature bands, then exact cosine re-ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import vector as V


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.
    Returns (query_id, vec_id, cosine, rk). Deterministic tie-break on id;
    ranking is on a 6-decimal-rounded score so results are reproducible
    across summation orders.

    The corpus scan is embarrassingly parallel (queries broadcast, cosine
    JVM-side); the final ranking goes through ``topk_per_group``'s map-side
    prune, so only k·|Q| rows per input partition reach the ranking shuffle
    — not the |corpus|·|Q| scored rows a bare window would move."""
    from .topk import topk_per_group

    # Norms are precomputed PER SIDE before the |Q|×|corpus| join (round
    # 14): V.cosine inline would re-aggregate norm(cv) once per query and
    # norm(qv) once per corpus row — 2/3 of the per-pair higher-order-
    # function work for values that are constant per row. Same doubles,
    # same operation order (dot/(qn·cn)), so scores are bit-identical.
    q = broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            V.norm_n(vec_col).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        V.norm_n(vec_col).alias("cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos6",
            F.round(V.dot_n("qv", "cv") / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "vec_id", "cos6")
    )
    return topk_per_group(scored, ["query_id"], "cos6", "vec_id", k).select(
        "query_id",
        "vec_id",
        F.round("cos6", round_to).alias("cosine"),
        "rk",
    )


def near_duplicate_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_to: int = 4,
) -> DataFrame:
    """All pairs (a_id < b_id) with cosine ≥ threshold. Exact; for corpora
    beyond ~10⁵ vectors use ``lsh_near_duplicate_pairs``."""
    a = corpus.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(V.cosine(F.col("va"), F.col("vb")), round_to))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


_RHP_SEED = 0xFE57


def rhp_signature(vec_col: F.Column, dim: int, bits: int = 16) -> F.Column:
    """Random-hyperplane (SimHash-for-vectors) signature: bit i = sign of
    <v, h_i>. Returns a long.

    One Arrow-vectorized pandas UDF doing a single (batch × dim) @ (dim ×
    bits) GEMM against a seeded Gaussian hyperplane matrix. The previous
    expression-tree form (bits × dim literal hash expressions) exploded
    whole-stage codegen at bits=64 (4096 sub-expressions, ~minute of Janino
    compile); the GEMM is deterministic (fixed-seed MT19937, platform-stable),
    numerically the textbook construction, and amortizes to microseconds per
    batch."""

    def _sig(v):
        import numpy as np
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype="int64")
        H = np.random.RandomState(_RHP_SEED).standard_normal((dim, bits))
        M = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        signs = (M @ H) >= 0
        weights = np.left_shift(np.uint64(1), np.arange(bits, dtype=np.uint64))
        packed = (signs.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.view(np.int64))

    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_sig, "long")(vec_col)


def lsh_near_duplicate_pairs(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    bits: int = 32,
    bands: int = 16,
    round_to: int = 4,
) -> DataFrame:
    """Approximate near-dup pairs: random-hyperplane signature, banded
    collision, exact cosine verify. The self-join is bucket-equi, so the
    pair count stays near-linear in corpus size for realistic distributions."""
    rows = bits // bands
    mask = (1 << rows) - 1
    sigs = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        rhp_signature(F.col(vec_col), dim, bits).alias("sig"),
    )
    # Band on (band, band_val, id) ONLY — the banded self-join and the pair
    # dedup shuffle narrow (long, long, long) rows instead of dragging the
    # full embedding payload through posexplode × bands copies. Vectors are
    # re-attached to the (much smaller) deduped candidate set afterwards;
    # at 100 TB this is the difference between shuffling ids and shuffling
    # the whole corpus ``bands`` times over.
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), b * rows).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    va = sigs.select(F.col("id").alias("a_id"), F.col("v").alias("va"))
    vb = sigs.select(F.col("id").alias("b_id"), F.col("v").alias("vb"))
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn("cosine", F.round(V.cosine(F.col("va"), F.col("vb")), round_to))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def rhp_collision_prob(cosine_threshold: float) -> float:
    """Per-bit signature agreement probability for two vectors at the given
    cosine: 1 − θ/π (Goemans-Williamson). The whole banded-LSH design rests
    on this one number."""
    import math

    return 1.0 - math.acos(max(-1.0, min(1.0, cosine_threshold))) / math.pi


def choose_rhp_params(
    cosine_threshold: float,
    target_miss: float = 1e-6,
    rows_per_band: int = 2,
    max_bits: int = 512,
) -> tuple[int, int]:
    """(bits, bands) such that a pair AT the threshold is missed with
    probability ≤ ``target_miss``: miss = (1 − p^r)^b with p the per-bit
    collision probability. Fixing r (bucket granularity = 2^r per band)
    and solving for b keeps candidate volume predictable; lower thresholds
    need more bands, capped at ``max_bits`` total. The catalog's 0.45 /
    bits=64 / bands=32 setting is exactly this function's output at
    target_miss=3e-8 (and a strict superset of the 1e-6 answer, 52/26)."""
    import math

    p = rhp_collision_prob(cosine_threshold)
    band_p = p**rows_per_band
    if band_p >= 1.0:
        return rows_per_band, 1
    bands = math.ceil(math.log(target_miss) / math.log(1.0 - band_p))
    bands = max(1, min(bands, max_bits // rows_per_band))
    return bands * rows_per_band, bands
