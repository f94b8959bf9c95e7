"""Connected-components dedup clusters + IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import cluster, ivf, similarity
from fest_vibes_ai_etl_spark.sources import table


def test_connected_components_transitive(spark):
    # chain 1-2-3, pair 5-6, isolated 9 (not in edges)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a_id long, b_id long"
    )
    comp = {r.node: r.component for r in cluster.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_dedup_survivors_keep_min_per_cluster(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 8)], "doc_id long, t string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a_id long, b_id long")
    kept = {r.doc_id for r in cluster.dedup_survivors(docs, pairs, "doc_id").collect()}
    assert kept == {1, 4, 5, 7}  # 2,3 fold into 1; 6 into 5


def test_ivf_recall_vs_brute_force(spark):
    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.topk_cosine(emb, queries, k=5).collect()
    }
    assigned, centers = ivf.build_ivf_index(emb, k=16, seed=42)
    # full probe ≡ brute force: validates the candidate/rerank machinery
    full = {
        (r.query_id, r.vec_id)
        for r in ivf.ivf_topk(assigned, centers, queries, topk=5, nprobe=16).collect()
    }
    assert full == exact
    # partial probe: nprobe=4/16 scans ~25% of the corpus; these synthetic
    # embeddings are only weakly clustered (max pairwise cosine ≈ 0.51), so
    # the bar is "clearly better than the scanned fraction", not 0.9+
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf.ivf_topk(assigned, centers, queries, topk=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall:.2f} not above scan fraction"


def test_ivf_deterministic(spark):
    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    a1, c1 = ivf.build_ivf_index(emb, k=8, seed=42)
    a2, c2 = ivf.build_ivf_index(emb, k=8, seed=42)
    assert c1 == c2
    r1 = sorted(map(tuple, ivf.ivf_topk(a1, c1, q, topk=3, nprobe=3).collect()))
    r2 = sorted(map(tuple, ivf.ivf_topk(a2, c2, q, topk=3, nprobe=3).collect()))
    assert r1 == r2


def test_ivf_recall_eval_floor(spark):
    """Measured recall@5 of the nprobe=4/16 probe vs exact full-probe ground
    truth. Data-dependent (quantizer + corpus), so the floor lives HERE, not
    in the SQL oracle (advisor round-3): measured 0.44-0.56 across
    sf0.001-0.1; floor 0.30 keeps >0.14 margin while staying above the 0.25
    blind 4-of-16 scan fraction."""
    from fest_vibes_ai_etl_spark.plans.catalog import REGISTRY, queries

    queries()
    row = REGISTRY["ann_ivf_recall_eval"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_results == 5 * row.n_queries  # full k per query
    assert row.recall_at_5 >= 0.30, row


def test_ivfpq_recall_eval_floor(spark):
    """IVF-PQ probe vs full-corpus ADC ground truth under the same
    quantizer: measured 0.30-0.46 across sf0.001-0.1; floor 0.28 > the 0.25
    blind fraction, documented data-dependence margin 0.02."""
    from fest_vibes_ai_etl_spark.plans.catalog import REGISTRY, queries

    queries()
    row = REGISTRY["ann_ivfpq_recall_eval"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_results == 5 * row.n_queries
    assert row.recall_at_5 >= 0.28, row


def test_sandwich_gate_blocks_large_corpus(spark):
    """The recall sandwiches must refuse production-scale corpora: ground
    truth is an exact scan per query."""
    import pytest as _pytest

    from fest_vibes_ai_etl_spark.plans import corpus as corpus_plans

    big = spark.range(corpus_plans.SANDWICH_MAX_CORPUS_ROWS + 1)
    with _pytest.raises(ValueError, match="eval gate"):
        corpus_plans._sandwich_gate(big)
