"""Incremental IVF index maintenance: streamed vectors join the persisted
cell-partitioned index without a rebuild, become probe-visible, and replays
converge (no duplicate ids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.operators import ivf
from fest_vibes_ai_etl_spark.sources import table


def _run(spark, src, index_dir, centers, ckpt):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ivf.start_incremental_index_add(stream, index_dir, centers, ckpt)
    assert q.awaitTermination(120), "stream did not finish in 120s"


def test_incremental_index_add_and_probe(spark, tmp_path):
    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = emb.filter("vec_id < 400")
    newer = emb.filter("vec_id >= 400")

    # offline build on the base corpus only
    assigned, centers = ivf.build_ivf_index(base, k=8, seed=7)
    index_dir = str(tmp_path / "index")
    assigned.repartition("cell_id").write.partitionBy("cell_id").parquet(index_dir)

    # stream the remaining vectors in as two batches (with an overlap replay)
    src = str(tmp_path / "src")
    newer.filter("vec_id < 450").coalesce(1).write.parquet(src)
    newer.filter("vec_id >= 430").coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, index_dir, centers, str(tmp_path / "ckpt1"))

    stored = spark.read.parquet(index_dir)
    n_total = emb.count()
    # every vector present exactly once despite the 430-449 overlap
    assert stored.count() == n_total
    assert stored.select("vec_id").distinct().count() == n_total

    # streamed vectors are probe-visible: querying one of them returns
    # neighbors, and full-probe equals brute force over the WHOLE corpus
    queries = emb.filter(F.col("vec_id") >= 495)
    got = ivf.ivf_topk(stored, centers, queries, topk=3, nprobe=8).collect()
    assert {r.query_id for r in got} == {r.vec_id for r in queries.collect()}

    from fest_vibes_ai_etl_spark.operators.similarity import topk_cosine

    exact = topk_cosine(emb, queries, k=3)
    assert sorted((r.query_id, r.vec_id, r.rk) for r in got) == sorted(
        (r.query_id, r.vec_id, r.rk) for r in exact.collect()
    )

    # replay under a fresh checkpoint appends nothing
    _run(spark, src, index_dir, centers, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(index_dir).count() == n_total
