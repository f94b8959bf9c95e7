"""IVF (inverted-file) approximate nearest-neighbor search.

The scale path for similarity search beyond random-hyperplane LSH: a coarse
quantizer (KMeans, seeded/deterministic) partitions the corpus into cells;
each query probes only its ``nprobe`` nearest cells and exact-reranks
within. Corpus scan cost drops from O(N) to O(N·nprobe/k).

Spark shape: the cell assignment is a one-off batch job (the "index build"),
producing a (cell_id, vec) table ideally *partitioned by cell_id* so a probe
reads only its cells' files; queries broadcast-join against the probed cells.
Everything after the KMeans fit is pure DataFrame ops; the fit itself is
``pyspark.ml`` (seeded — retries deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import vector as V


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
    max_iter: int = 8,
):
    """Fit the coarse quantizer and assign every corpus vector to a cell.
    Returns (assigned_df with cell_id, centers: list[list[float]]).

    The fit is the one-off index build — amortized over every subsequent
    query batch in deployment (persist ``assigned`` partitioned by cell_id);
    8 Lloyd iterations is plenty for a coarse quantizer."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Spherical k-means: L2-normalize before clustering so Euclidean cells
    # on the unit sphere track cosine neighborhoods regardless of input
    # vector magnitudes. (Recall on weakly-clustered corpora is bounded by
    # the probed fraction — IVF pays off in proportion to how clustered the
    # embedding space actually is.)
    ml_df = corpus.select(
        F.col(id_col),
        V.l2_normalize(F.col(vec_col)).alias(vec_col),
    ).select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(ml_df)
    assigned = model.transform(ml_df).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("cell_id")
    )
    centers = [c.tolist() for c in model.clusterCenters()]
    return assigned, centers


def ivf_topk(
    assigned: DataFrame,
    centers: list[list[float]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: each query scans only its ``nprobe``
    closest cells (by centroid cosine), exact rerank within."""
    centers_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centers]
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # rank cells per query by centroid similarity, keep nprobe
    q_cells = (
        q.select(
            "query_id",
            "qv",
            F.posexplode(centers_arr).alias("cell_id", "center"),
        )
        .withColumn("c_sim", V.cosine(F.col("qv"), F.col("center")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("c_sim"), "cell_id")
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )
    cand = assigned.join(broadcast(q_cells), "cell_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.withColumn("cos6", F.round(V.cosine(F.col("qv"), F.col(vec_col)), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", F.col(id_col).alias("vec_id"), F.round("cos6", 4).alias("cosine"), "rk")
    )
