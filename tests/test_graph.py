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


def test_pagerank_tol_early_exit(spark):
    """On a 2-regular graph (cycle) every node keeps pr=1.0 exactly, so the
    L1 delta at the first checkpoint is 0 and the loop must stop there
    instead of burning the remaining rounds; the result still matches the
    reference loop (which is stationary)."""
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    pr = pagerank(
        _sym_edges(spark, cyc), iterations=50, checkpoint_every=1, tol=1e-9
    )
    assert pr._pagerank_iterations_run == 1
    got = {r.node: r.pr for r in pr.collect()}
    assert got == {n: pytest.approx(1.0) for n in "abcd"}


def test_pagerank_tol_converges_on_nonstationary_graph(spark):
    """A non-regular graph converges in finitely many rounds: with a loose
    tolerance the loop exits before the iteration budget, and the scores it
    returns match the reference loop run for the SAME number of rounds."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e")]
    pr = pagerank(
        _sym_edges(spark, pairs), iterations=100, checkpoint_every=2, tol=1e-6
    )
    ran = pr._pagerank_iterations_run
    assert ran < 100
    got = {r.node: r.pr for r in pr.collect()}
    want = _reference_pr(pairs, ran)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-9), n


def test_pagerank_nodes_seed_matches_distinct(spark):
    """Seeding initial ranks from an explicit node table is score-identical
    to deriving the node set from the edges."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e")]
    e = _sym_edges(spark, pairs)
    nodes = e.select(F.col("src").alias("node")).distinct()
    base = {r.node: r.pr for r in pagerank(e, iterations=3).collect()}
    seeded = {
        r.node: r.pr for r in pagerank(e, iterations=3, nodes=nodes).collect()
    }
    assert seeded == base


def test_pagerank_hub_ranks_highest(spark):
    # star graph: hub touches every spoke -> hub must rank first
    pairs = [("hub", f"s{i}") for i in range(10)]
    out = pagerank(_sym_edges(spark, pairs), iterations=3).collect()
    top = max(out, key=lambda r: r.pr)
    assert top.node == "hub"


def test_pagerank_tol_checked_even_below_checkpoint_interval(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    # budget smaller than checkpoint_every: the delta check must still run
    # (previously silently skipped — caller believed convergence was tested)
    pr = pagerank(edges, iterations=3, checkpoint_every=8, tol=1e12)
    # absurdly loose tol: the very first check must declare convergence
    assert pr._pagerank_converged is True
    assert pr._pagerank_iterations_run <= 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(edges, iterations=3, checkpoint_every=0, tol=1e-6)


def test_pagerank_computed_edges_are_persisted_even_for_shallow_runs(spark):
    # raw (src,dst) edges: the degree agg + upstream construction is the
    # loop invariant and must be cached no matter how shallow the run
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    pr = pagerank(edges, iterations=2)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    pr.count()
    spark.catalog.clearCache()
