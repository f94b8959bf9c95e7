"""Cross-encoder rerank seam: stub determinism, top-k semantics, and the
guard-import factory (mirrors the bi-encoder seam tests in test_enrich.py)."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import rerank


def test_fake_scorer_is_md5_uniform():
    s = rerank.fake_cross_score_batch(
        pd.Series(["q1", "q1", None]), pd.Series(["a", "b", "c"])
    )
    want = int(hashlib.md5(b"q1|a").hexdigest()[:8], 16) / 4294967296.0
    assert s[0] == want
    assert s[0] != s[1]  # doc-sensitive
    assert s[2] is None or pd.isna(s[2])  # degrade-to-null


def test_rerank_topk_orders_by_stub_score(spark):
    rows = [(i, f"doc {i}", "the query", 0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, q string, g int")
    out = rerank.rerank_topk(df, "q", "text", "g", "doc_id", k=5).collect()
    assert len(out) == 5
    assert [r["rk"] for r in out] == sorted(r["rk"] for r in out)
    # scores must equal the stub applied locally, ranked desc with id ties
    want = sorted(
        (
            (
                round(
                    int(hashlib.md5(f"the query|doc {i}".encode()).hexdigest()[:8], 16)
                    / 4294967296.0,
                    6,
                ),
                -i,
            )
            for i in range(20)
        ),
        reverse=True,
    )[:5]
    got = [(r["score6"], -r["doc_id"]) for r in sorted(out, key=lambda r: r["rk"])]
    assert got == want


def test_real_factory_gated_on_import():
    scorer = rerank.real_cross_encoder_factory()
    try:
        import sentence_transformers  # noqa: F401

        assert scorer is not None
    except ImportError:
        assert scorer is None


def test_custom_scorer_is_used(spark):
    df = spark.createDataFrame(
        [(1, "a", "q", 0), (2, "b", "q", 0)],
        "doc_id long, text string, q string, g int",
    )

    def scorer(qs, ds):
        return pd.Series([float(len(d)) + 41.0 for d in ds], dtype="float64")

    out = rerank.rerank_topk(df, "q", "text", "g", "doc_id", scorer=scorer, k=2)
    assert {r["score6"] for r in out.collect()} == {42.0}
