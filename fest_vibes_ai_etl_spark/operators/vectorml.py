"""Vector-native ML-pipeline operators: k-means assignment, SemDeDup-style
semantic dedup, product quantization, and a distributed Gram/covariance
matrix — the embedding-side toolkit a 100 TB training-data pipeline needs
between "store vectors" (operators/similarity.py, operators/ivf.py) and
"train a model" (somewhere else entirely).

Scale stances, per operator:

- **centroid assignment** (``assign_nearest_centroid``): the codebook is
  tiny (k ≤ a few thousand) and the corpus is the big side, so the
  assignment is a pure per-row map over a LITERAL centroid array — argmax
  cosine computed with higher-order array functions inside codegen. Zero
  joins, zero shuffles, no Python. (Contrast operators/ivf.py's
  ``assign_to_centers``: the Arrow/numpy path — faster per element for
  k·dim in the tens of thousands, but leaves codegen. Both are per-row
  maps; pick by codebook size.) Fitting the codebook is the driver-side
  sampled k-means in ivf._fit_spherical_kmeans — at 100 TB you fit on a
  bounded sample and assign distributed, never the reverse.
- **SemDeDup** (Abbas et al. 2023, arXiv:2303.09540): near-duplicate
  pruning that only compares vectors WITHIN a cluster, turning the O(n²)
  all-pairs scan into Σ O(n_c²) with n_c ≈ n/k — the same
  bucket-then-verify shape as the MinHash band join, but with the buckets
  chosen semantically. The within-cluster pair join shuffles on the
  (small-cardinality) cluster id; survivors are decided by a monotone
  lowest-id-wins rule so the result is deterministic and
  oracle-expressible (no greedy iteration order to disagree about).
- **product quantization** (Jégou et al. 2011, IEEE TPAMI 33(1)): split
  the d-dim vector into m subspaces, code each against a per-subspace
  codebook; a 64-dim float32 vector (256 B) becomes m small codes
  (m bytes at k ≤ 256) — a 256× compression that is what actually lets a
  100 TB vector corpus fit an ANN serving tier. Encoding is again a
  literal-codebook per-row map: zero shuffle, codegen-side.
- **Gram / covariance** (``gram_matrix``): X'X computed as per-partition
  numpy partials (d×d each) that are then summed — the map-side-combine
  pattern applied to matrix accumulation. The shuffle moves
  O(partitions · d²) floats, never O(rows); at 100 TB with d = 64 that is
  a few MB total. The d×d result is driver-sized by construction; PCA's
  eigensolve on it is a driver-side O(d³) afterthought, not a Spark job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """The k lowest-id vectors as a deterministic codebook (the fixture
    stand-in for a sampled k-means fit — same driver-sized artifact either
    way: k·dim floats, collected once, embedded as literals)."""
    rows = (
        df.select(id_col, vec_col)
        .filter(F.col(id_col) < k)
        .orderBy(id_col)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _lit_vec(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def best_centroid(vec: Column, centers: list[list[float]], round_to: int = 6) -> Column:
    """struct(cos6, cluster_id) of the max-cosine centroid for ``vec``,
    ties broken toward the lowest centroid id. Pure column expression over
    a literal codebook: array_min over per-centroid (-cos6, id) structs —
    struct comparison is lexicographic, so the min is (max cosine, then
    lowest id). No join, no shuffle, no Python."""
    scored = F.array(
        *[
            F.struct(
                (-F.round(V.cosine(vec, _lit_vec(c)), round_to)).alias("negc"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centers)
        ]
    )
    best = F.array_min(scored)
    return F.struct(
        (-best["negc"]).alias("cos"), best["cid"].alias("cluster_id")
    )


def assign_nearest_centroid(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Adds (cluster_id int, cos double): spherical k-means assignment
    against a literal codebook. The one-Lloyd-step scoring primitive —
    iterate assign → groupBy(cluster_id).avg to refit (each refit is one
    map-side-combined shuffle of k·dim partials)."""
    b = best_centroid(F.col(vec_col), centers, round_to)
    return df.withColumn("_b", b).select(
        *df.columns,
        F.col("_b.cluster_id").cast("int").alias("cluster_id"),
        F.col("_b.cos").alias("cos"),
    )


def semantic_dedup(
    df: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_to: int = 4,
) -> DataFrame:
    """SemDeDup: per-cluster near-duplicate pruning. Returns per-cluster
    (cluster_id, n_members, n_pruned, n_survivors) where a vector is pruned
    iff some LOWER-id member of the same cluster has cosine ≥ threshold
    with it (monotone rule — deterministic regardless of join/iteration
    order, unlike greedy sequential pruning). The pair join is cluster_id
    co-partitioned: all-pairs cost collapses from O(n²) to Σ O(n_c²)."""
    assigned = assign_nearest_centroid(df, centers, vec_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), "cluster_id"
    )
    a = assigned.select(
        F.col("vid").alias("a_id"), F.col("v").alias("av"), "cluster_id"
    )
    b = assigned.select(
        F.col("vid").alias("b_id"), F.col("v").alias("bv"), "cluster_id"
    )
    pruned = (
        a.join(b, "cluster_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(V.cosine(F.col("av"), F.col("bv")), round_to) >= threshold)
        .select("cluster_id", "b_id")
        .distinct()
    )
    members = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    losses = pruned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_pruned"))
    return (
        members.join(losses, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_pruned", F.lit(0)).alias("n_pruned"),
            (F.col("n_members") - F.coalesce("n_pruned", F.lit(0))).alias(
                "n_survivors"
            ),
        )
    )


def subspace_codebooks(
    df: DataFrame,
    m: int,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """m per-subspace codebooks of k entries each, sliced from the k seed
    vectors (deterministic fixture fit — a real fit is per-subspace k-means
    on a driver-side sample, same artifact shape)."""
    assert dim % m == 0
    dsub = dim // m
    seeds = seed_centroids(df, k, id_col, vec_col)
    return [[c[s * dsub : (s + 1) * dsub] for c in seeds] for s in range(m)]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Adds (code string "c0-c1-…-cm", recon_dist double): per-subspace
    nearest-codeword (Euclidean, rounded argmin, lowest-id tie-break) and
    the summed sub-distances (the PQ reconstruction error). Literal
    codebooks ⇒ pure map, zero shuffle."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def sub_dist(s: int, c: list[float]) -> Column:
        sl = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        sq = F.zip_with(
            sl,
            _lit_vec(c),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))

    def best(s: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    F.round(sub_dist(s, c), round_to).alias("d"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(codebooks[s])
            ]
        )
        return F.array_min(scored)

    bests = [best(s) for s in range(m)]
    code = F.concat_ws("-", *[b["cid"].cast("string") for b in bests])
    recon = sum([b["d"] for b in bests[1:]], bests[0]["d"])
    return df.select(*df.columns, code.alias("code"), recon.alias("recon_dist"))


def pq_reconstruct(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Adds (recon array<double>): the PQ-decompressed vector — each
    subspace replaced by its nearest codeword (same rounded argmin as
    ``pq_encode``). dist(query, recon) is exactly the asymmetric-distance
    (ADC) score of Jégou et al. 2011 §III — the compressed-domain scan: at
    serving time the corpus side is m codes, not d floats, and the scan
    reads the 4-byte codes while only the (few) queries stay full-width.
    Still a pure literal-codebook map: zero shuffle, zero Python."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def sub_dist(s: int, c: list[float]) -> Column:
        sl = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        sq = F.zip_with(
            sl,
            _lit_vec(c),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))

    def best_code(s: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    F.round(sub_dist(s, c), round_to).alias("d"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(codebooks[s])
            ]
        )
        return F.array_min(scored)["cid"]

    def sub_recon(s: int) -> Column:
        cb = F.array(*[_lit_vec(c) for c in codebooks[s]])
        return F.element_at(cb, best_code(s) + 1)

    recon = F.flatten(F.array(*[sub_recon(s) for s in range(m)]))
    return df.select(*df.columns, recon.alias("recon"))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """(i, j, s, n, sum_i, sum_j) for 0 ≤ i, j < dim where s = Σ x_i·x_j over
    all rows — the Gram matrix as a DataFrame, computed via per-partition
    numpy partials (one d×d float64 block per Arrow batch) summed with an
    ordinary groupBy. The shuffle carries O(batches·d²) scalars, never a
    per-row expansion; covariance/PCA derive from (s, n, sums) exactly."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    partial_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s_flat", ArrayType(DoubleType())),
            StructField("colsum", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "s_flat": [(X.T @ X).ravel().tolist()],
                    "colsum": [X.sum(axis=0).tolist()],
                }
            )

    part = df.select(vec_col).mapInPandas(partials, schema=partial_schema)
    cells = part.select(
        "n",
        "colsum",
        F.posexplode("s_flat").alias("idx", "v"),
    )
    # groupBy idx sums partials; n/colsum ride along via first() of the
    # per-partial constants aggregated separately to avoid double counting.
    sums = cells.groupBy("idx").agg(F.sum("v").alias("s"))
    totals = part.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("colsum"),
            F.array(*[F.lit(0.0)] * dim),
            lambda acc, c: F.zip_with(acc, c, lambda x, y: x + y),
        ).alias("colsum"),
    )
    return (
        sums.crossJoin(F.broadcast(totals))
        .select(
            (F.col("idx") / dim).cast("int").alias("i"),
            (F.col("idx") % dim).cast("int").alias("j"),
            "s",
            "n",
            F.element_at("colsum", (F.col("idx") / dim).cast("int") + 1).alias(
                "sum_i"
            ),
            F.element_at("colsum", (F.col("idx") % dim).cast("int") + 1).alias(
                "sum_j"
            ),
        )
    )


def covariance_pairs(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """(i, j, cov) for i < j: sample covariance between embedding dimensions,
    derived from the Gram matrix — cov = (S_ij − n·μ_i·μ_j)/(n−1)."""
    g = gram_matrix(df, vec_col, dim)
    return g.filter(F.col("i") < F.col("j")).select(
        "i",
        "j",
        (
            (F.col("s") - F.col("sum_i") * F.col("sum_j") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("cov"),
    )
