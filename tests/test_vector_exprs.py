"""Round-14 expr-twin equivalence: the name-based one-parse builders
(`V.dot_n`/`V.norm_n`, `vectorml.l2_distance_n`, `recon_from_codes_n`)
must produce BIT-IDENTICAL results to the lambda-built originals — they
exist purely to cut ~70 ms/call of py4j plan-construction time, not to
change a single double."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.functions import vector as V
from fest_vibes_ai_etl_spark.operators import vectorml
from fest_vibes_ai_etl_spark.sources import table


@pytest.fixture(scope="module")
def vecs(spark):
    return (
        table(spark, SF_DIR, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").alias("a"),
            F.reverse(F.col("embedding")).alias("b"),
        )
        .limit(64)
    )


def test_dot_norm_expr_twins_bit_identical(vecs):
    both = vecs.select(
        "vec_id",
        V.dot(F.col("a"), F.col("b")).alias("dot_l"),
        V.dot_n("a", "b").alias("dot_e"),
        V.norm(F.col("a")).alias("norm_l"),
        V.norm_n("a").alias("norm_e"),
    ).collect()
    assert both
    for r in both:
        # exact equality, not approx: same expression tree → same doubles
        assert r["dot_l"] == r["dot_e"]
        assert r["norm_l"] == r["norm_e"]


def test_l2_distance_expr_twin_bit_identical(vecs):
    both = vecs.select(
        vectorml.l2_distance(F.col("a"), F.col("b")).alias("l"),
        vectorml.l2_distance_n("a", "b").alias("e"),
    ).collect()
    assert both
    assert all(r["l"] == r["e"] for r in both)


def test_recon_from_codes_expr_twin_bit_identical(spark):
    emb = table(spark, SF_DIR, "embeddings")
    books = vectorml.subspace_codebooks(emb, 4, 8, 64)
    codes = emb.limit(32).select(
        "vec_id", vectorml.pq_codes_column(F.col("embedding"), books).alias("codes")
    )
    both = codes.select(
        vectorml.recon_from_codes(F.col("codes"), books).alias("l"),
        vectorml.recon_from_codes_n("codes", books).alias("e"),
    ).collect()
    assert both
    assert all(r["l"] == r["e"] for r in both)
