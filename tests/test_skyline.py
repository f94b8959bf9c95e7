"""pareto_frontier_2d vs a brute-force dominance check on crafted and
random inputs (the oracle-parity test covers the catalog query; this one
pins the operator's tie semantics directly)."""

from __future__ import annotations

import random

from fest_vibes_ai_etl_spark.operators.skyline import pareto_frontier_2d


def _brute(rows):
    out = []
    for i, (_, x, y) in enumerate(rows):
        dominated = any(
            (qx <= x and qy >= y and (qx < x or qy > y))
            for j, (_, qx, qy) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append(rows[i])
    return sorted(out)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = sorted(
        tuple(r)
        for r in pareto_frontier_2d(df, "x", "y").select("id", "x", "y").collect()
    )
    assert got == _brute(rows)


def test_ties_on_both_axes_all_kept(spark):
    rows = [(1, 5.0, 10), (2, 5.0, 10), (3, 7.0, 10), (4, 4.0, 1)]
    # (1,2) tie exactly: neither dominates, both on frontier; 3 is
    # dominated (same y, pricier); 4 is cheaper so it survives.
    _run(spark, rows)


def test_single_row_and_total_order(spark):
    _run(spark, [(1, 1.0, 1)])
    _run(spark, [(i, float(i), i) for i in range(10)])  # all on frontier
    _run(spark, [(i, float(i), 10 - i) for i in range(10)])  # only cheapest


def test_random_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 20)), rng.randint(0, 20)) for i in range(300)
    ]
    _run(spark, rows)
