"""PageRank operator semantics on a hand-checkable graph (the declared
customer-supplier query is value-checked by test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators.graph import pagerank


def _sym_edges(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src string, dst string")


def _reference_pr(pairs, iterations, d=0.85):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    pr = {n: 1.0 for n in adj}
    for _ in range(iterations):
        pr = {
            n: (1.0 - d) + d * sum(pr[m] / len(adj[m]) for m in adj[n])
            for n in adj
        }
    return pr


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_reference_loop(spark, iterations):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e")]
    got = {
        r.node: r.pr
        for r in pagerank(_sym_edges(spark, pairs), iterations=iterations).collect()
    }
    want = _reference_pr(pairs, iterations)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-12), n


def test_pagerank_hub_ranks_highest(spark):
    # star graph: hub touches every spoke -> hub must rank first
    pairs = [("hub", f"s{i}") for i in range(10)]
    out = pagerank(_sym_edges(spark, pairs), iterations=3).collect()
    top = max(out, key=lambda r: r.pr)
    assert top.node == "hub"
