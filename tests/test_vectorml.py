"""Unit + plan-shape tests for operators/vectorml.py: literal-codebook
assignment and PQ encoding must stay pure codegen maps (no shuffle, no
Python), the Gram matrix must agree with numpy, and the SemDeDup pruning
rule must be the documented monotone lowest-id-wins one."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.operators import vectorml
from fest_vibes_ai_etl_spark.sources import table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def centers(emb):
    return vectorml.seed_centroids(emb, 8)


def test_assignment_is_pure_map(emb, centers):
    plan = _plan(vectorml.assign_nearest_centroid(emb, centers))
    assert "Exchange" not in plan  # no join, no shuffle
    assert "Python" not in plan  # codegen-side argmax, no UDF


def test_pq_encode_is_pure_map(emb):
    books = vectorml.subspace_codebooks(emb, 4, 8, 64)
    plan = _plan(vectorml.pq_encode(emb, books))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_assignment_matches_numpy(emb, centers):
    rows = vectorml.assign_nearest_centroid(emb, centers).select(
        "vec_id", "cluster_id"
    ).collect()
    got = {r["vec_id"]: r["cluster_id"] for r in rows}
    X = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
        for r in emb.collect()
    }
    C = np.asarray(centers, dtype="float64")
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for vid, x in X.items():
        cos = np.round(Cn @ (x / np.linalg.norm(x)), 6)
        # max cosine, lowest id on ties — argmax returns the first maximum
        assert got[vid] == int(np.argmax(cos)), vid


def test_gram_matrix_matches_numpy(spark, emb):
    g = vectorml.gram_matrix(emb, dim=64).collect()
    X = np.vstack(
        [np.asarray(r["embedding"], dtype="float64") for r in emb.collect()]
    )
    S = X.T @ X
    colsum = X.sum(axis=0)
    n = X.shape[0]
    assert len(g) == 64 * 64
    for r in g:
        assert r["n"] == n
        assert abs(r["s"] - S[r["i"], r["j"]]) < 1e-8 * max(1.0, abs(S[r["i"], r["j"]]))
        assert abs(r["sum_i"] - colsum[r["i"]]) < 1e-9
        assert abs(r["sum_j"] - colsum[r["j"]]) < 1e-9


def test_covariance_matches_numpy(emb):
    pairs = vectorml.covariance_pairs(emb, dim=64).collect()
    X = np.vstack(
        [np.asarray(r["embedding"], dtype="float64") for r in emb.collect()]
    )
    cov = np.cov(X, rowvar=False)  # sample covariance, ddof=1
    assert len(pairs) == 64 * 63 // 2
    for r in pairs:
        assert abs(r["cov"] - cov[r["i"], r["j"]]) < 1e-10


def test_semdedup_monotone_rule(spark):
    # 4 vectors in one cluster: 0~1 near-dup, 1~2 near-dup, 0!~2; 3 far.
    # Monotone rule prunes BOTH 1 (lower-id dup 0) and 2 (lower-id dup 1)
    # — unlike greedy sequential dedup, the outcome cannot depend on scan
    # order; survivor count is deterministic by construction.
    # cos(0,1)=0.800, cos(1,2)≈0.842, cos(0,2)≈0.350. With tau=0.75 the
    # pairs (0,1) and (1,2) fire, (0,2) does not — ids 1 AND 2 both prune
    # (2 via its lower-id dup 1, even though 1 itself is pruned).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.8, 0.6, 0.0, 0.0]),
        (2, [0.35, 0.937, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = [[1.0, 0.3, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    out = {
        r["cluster_id"]: r
        for r in vectorml.semantic_dedup(
            df, centers, threshold=0.75, round_to=4
        ).collect()
    }
    assert out[0]["n_members"] == 3
    assert out[0]["n_pruned"] == 2  # ids 1 and 2
    assert out[0]["n_survivors"] == 1  # id 0 only
    assert out[1]["n_members"] == 1 and out[1]["n_pruned"] == 0


def test_pq_reconstruct_is_pure_map(emb):
    books = vectorml.subspace_codebooks(emb, 4, 8, 64)
    plan = _plan(vectorml.pq_reconstruct(emb, books))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_pq_reconstruct_matches_encode(emb):
    # recon must be exactly the codewords selected by pq_encode: decoding
    # recon slice-by-slice against the codebook reproduces the code string
    books = vectorml.subspace_codebooks(emb, 4, 8, 64)
    enc = {r["vec_id"]: r["code"] for r in vectorml.pq_encode(emb, books).collect()}
    for r in vectorml.pq_reconstruct(emb, books).collect():
        got = []
        for s in range(4):
            sub = list(r["recon"][s * 16 : (s + 1) * 16])
            got.append(str(books[s].index(sub)))
        assert "-".join(got) == enc[r["vec_id"]], r["vec_id"]


def test_semdedup_pair_join_is_cluster_keyed(emb, centers):
    plan = _plan(vectorml.semantic_dedup(emb, centers))
    # the near-dup comparison must be an equi-join on cluster_id, never a
    # cartesian/all-pairs product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_store_build_once_then_load(spark, emb, tmp_path, monkeypatch):
    # second call must be a metadata load, not a rebuild
    from fest_vibes_ai_etl_spark.operators import vectorml as vm
    import os

    monkeypatch.setattr(vm, "_PQ_WAREHOUSE", str(tmp_path / "pq"))
    codes1, books1 = vm.load_or_build_pq_codes(spark, emb, SF_DIR, 4, 8, 64)
    path = vm.pq_store_path(SF_DIR, 4, 8)
    success = os.path.join(path, "codes", "_SUCCESS")
    mtime = os.path.getmtime(success)
    codes2, books2 = vm.load_or_build_pq_codes(spark, emb, SF_DIR, 4, 8, 64)
    assert os.path.getmtime(success) == mtime  # not rewritten
    assert books1 == books2
    a = {r["vec_id"]: list(r["codes"]) for r in codes1.collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in codes2.collect()}
    assert a == b


def test_adc_triangle_inequality(emb):
    # |d(q,x) - d(q,recon(x))| <= d(x,recon(x)) = recon_dist (+ rounding
    # slack): the ADC error is bounded by the quantization error — the
    # invariant that makes compressed-domain ranking trustworthy
    books = vectorml.subspace_codebooks(emb, 4, 8, 64)
    enc = vectorml.pq_encode(emb, books).select("vec_id", "embedding", "recon_dist")
    rec = vectorml.pq_reconstruct(emb, books).select(
        "vec_id", "recon"
    )
    q = [r for r in emb.filter(F.col("vec_id") == 0).collect()][0]["embedding"]
    qv = np.asarray(q, dtype="float64")
    joined = {r["vec_id"]: r for r in enc.join(rec, "vec_id").collect()}
    for vid, r in joined.items():
        x = np.asarray(r["embedding"], dtype="float64")
        rx = np.asarray(r["recon"], dtype="float64")
        true_d = float(np.linalg.norm(qv - x))
        adc_d = float(np.linalg.norm(qv - rx))
        # recon_dist is a sum of per-subspace ROUNDED distances; the true
        # quantization error sqrt(sum d_s^2) <= sum d_s, so the bound holds
        # with a small rounding slack
        assert abs(true_d - adc_d) <= r["recon_dist"] + 1e-4, vid


def test_weighted_reservoir_prefers_heavy_rows(spark):
    from fest_vibes_ai_etl_spark.plans import catalog

    catalog.queries()  # populate the lazy registry
    sample = catalog.REGISTRY["sample_weighted_reservoir"].fn(spark, SF_DIR)
    avg_sample_w = sample.agg(F.avg("w")).collect()[0][0]
    li = table(spark, SF_DIR, "lineitem")
    avg_pop_w = li.agg(F.avg("l_quantity")).collect()[0][0]
    # Efraimidis-Spirakis draws proportional-to-weight: the sampled rows'
    # mean weight must sit clearly above the population mean
    assert avg_sample_w > avg_pop_w * 1.2
