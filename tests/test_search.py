"""BM25 retrieval semantics on a hand-checkable corpus."""

from __future__ import annotations

import math

from fest_vibes_ai_etl_spark.operators.search import build_postings, bm25_topk


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),       # tf(apple)=2, dl=3
            (2, "apple cherry"),             # tf(apple)=1, dl=2
            (3, "cherry cherry cherry"),     # no query terms
            (4, "banana"),                   # no query terms
        ],
        "doc_id long, text string",
    )
    postings, doclen = build_postings(docs)
    out = bm25_topk(postings, doclen, ["apple"], topn=10).collect()
    # only docs containing the term appear; higher tf wins here because the
    # length normalization (dl 3 vs 2, avgdl 2.25) doesn't offset tf 2 vs 1
    assert [r.doc_id for r in out] == [1, 2]
    # spot-check doc 2 against the closed form
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    norm = 1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 2.25)
    expect = round(idf * 1 * 2.2 / norm + 1e-8, 4)
    got = {r.doc_id: r.score for r in out}
    assert abs(got[2] - expect) < 1e-9


def test_bm25_multi_term_accumulates(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x"), (3, "y"), (4, "z")],
        "doc_id long, text string",
    )
    postings, doclen = build_postings(docs)
    out = {r.doc_id: r.score for r in bm25_topk(postings, doclen, ["x", "y"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] > out[2] == out[3]  # both terms beat either alone; symmetry
