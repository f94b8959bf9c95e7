"""Sketch aggregates: HLL distinct estimates bounded against exact answers,
sketch mergeability (the reusable-partial property), and approx-percentile
rank-error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.plans.sketches import daily_user_sketches
from fest_vibes_ai_etl_spark.plans import catalog
from fest_vibes_ai_etl_spark.sources import table


def test_hll_daily_estimate_within_bounds(spark):
    # raw estimate bound (the catalog query folds this into est_within_5pct;
    # here the actual numeric estimate is checked against the exact count)
    events = table(spark, SF_DIR, "events")
    approx = {
        r.day: r.approx_users
        for r in daily_user_sketches(events)
        .select("day", F.hll_sketch_estimate("user_sketch").alias("approx_users"))
        .collect()
    }
    exact = {
        r.day: r.n
        for r in events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, approx[day], n)
    # and the eval_only query must report every day in-band (the pytest
    # floor backing the driver-facing query, which projects exacts only)
    rows = catalog.REGISTRY["sketch_hll_daily_users_eval"].fn(spark, SF_DIR).collect()
    assert rows and all(r.est_within_5pct for r in rows)
    assert "sketch_hll_daily_users_eval" not in catalog.queries()


def test_approx_distinct_eval_floor(spark):
    # HLL++ approx_count_distinct floor for the approx_distinct_users family
    catalog.queries()  # force registry load
    rows = catalog.REGISTRY["approx_distinct_users_eval"].fn(spark, SF_DIR).collect()
    assert rows and all(r.est_within_5pct for r in rows)
    assert "approx_distinct_users_eval" not in catalog.queries()


def test_hll_sketches_merge_to_coarser_grain(spark):
    # union of per-day sketches == sketch built over the whole range:
    # the property that lets a 100 TB engine answer any date-range distinct
    # count from persisted daily partials without rescanning the fact.
    events = table(spark, SF_DIR, "events")
    daily = daily_user_sketches(events)
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias("est")
    ).collect()[0].est
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est")
    ).collect()[0].est
    assert merged == direct


def test_approx_percentile_rank_error(spark):
    # raw rank-error bound on the estimates themselves (the catalog query
    # folds the same check into p50/p95_in_rank_band booleans)
    events = table(spark, SF_DIR, "events")
    approx = {
        r.event_type: (r.p[0], r.p[1], r.p[2])
        for r in events.groupBy("event_type")
        .agg(
            F.approx_percentile(
                "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
            ).alias("p")
        )
        .collect()
    }
    for etype, (p50, p95, p99) in approx.items():
        vals = sorted(
            r.value for r in events.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for q, got in ((0.5, p50), (0.95, p95), (0.99, p99)):
            # rank of the returned value must be within 1% of the target rank
            import bisect
            lo, hi = bisect.bisect_left(vals, got), bisect.bisect_right(vals, got)
            target = q * n
            assert lo - 0.01 * n - 1 <= target <= hi + 0.01 * n + 1, (etype, q, got)
    catalog.queries()  # force registry load
    rows = catalog.REGISTRY["sketch_quantiles_rank_band_eval"].fn(spark, SF_DIR).collect()
    assert rows and all(r.p50_in_rank_band and r.p95_in_rank_band for r in rows)
    assert "sketch_quantiles_rank_band_eval" not in catalog.queries()


def _exact_token_counts(spark):
    import re
    from collections import Counter

    pat = re.compile(r"[a-z0-9']+")
    c = Counter()
    for r in table(spark, SF_DIR, "documents").select("text").collect():
        if r.text:
            c.update(pat.findall(r.text.lower()))
    return c


def test_misra_gries_sandwich_bound(spark):
    from fest_vibes_ai_etl_spark.operators.freqsketch import (
        heavy_hitter_candidates,
        token_mg_summaries,
    )

    docs = table(spark, SF_DIR, "documents")
    true = _exact_token_counts(spark)
    cands = heavy_hitter_candidates(token_mg_summaries(docs, "text", k=8)).collect()
    assert cands, "sketch produced no candidates"
    D = cands[0].max_undercount
    assert D > 0, "k=8 over a 31-word vocabulary must trigger decrements"
    for r in cands:
        assert r.est_count <= true[r.item] <= r.est_count + D, (r.item, r.est_count, true[r.item], D)
    # Completeness: any token the sketch dropped has true count <= D.
    kept = {r.item for r in cands}
    for tok, n in true.items():
        if tok not in kept:
            assert n <= D, (tok, n, D)


def test_misra_gries_exact_when_k_exceeds_vocab(spark):
    from fest_vibes_ai_etl_spark.operators.freqsketch import (
        heavy_hitter_candidates,
        token_mg_summaries,
    )

    docs = table(spark, SF_DIR, "documents")
    true = _exact_token_counts(spark)
    cands = heavy_hitter_candidates(token_mg_summaries(docs, "text", k=64)).collect()
    assert cands[0].max_undercount == 0
    got = {r.item: r.est_count for r in cands}
    assert got == dict(true)


def test_kmv_estimate_accuracy_and_exact_regime(spark):
    """KMV k=64: below k the sketch IS the set (exact); above k the
    (k-1)/kth-min estimator lands within the ~3/sqrt(k) standard-error
    envelope on a 5000-distinct-key set."""
    from pyspark.sql import functions as F

    from fest_vibes_ai_etl_spark.operators import kmvsketch

    small = spark.range(40).select(F.lit("g").alias("g"), F.col("id"))
    kset = kmvsketch.k_smallest_hashes(small, ["g"], "id", 64)
    est = kmvsketch.kmv_estimate(kset, ["g"], 64).collect()[0]
    assert est.n_distinct_est == 40.0  # exact below k

    big = spark.range(5000).select(F.lit("g").alias("g"), F.col("id"))
    kset = kmvsketch.k_smallest_hashes(big, ["g"], "id", 64)
    est = kmvsketch.kmv_estimate(kset, ["g"], 64).collect()[0]
    assert abs(est.n_distinct_est - 5000) / 5000 < 3 / (64 ** 0.5), est


def test_kmv_intersection_tracks_truth(spark):
    """Overlapping ranges: A=[0,3000), B=[2000,5000); true |A∩B|=1000,
    |A∪B|=5000. Estimates must land within the KMV error envelope."""
    from pyspark.sql import functions as F

    from fest_vibes_ai_etl_spark.operators import kmvsketch

    a = kmvsketch.k_smallest_hashes(
        spark.range(0, 3000).select(F.col("id")), [], "id", 64
    )
    b = kmvsketch.k_smallest_hashes(
        spark.range(2000, 5000).select(F.col("id")), [], "id", 64
    )
    r = kmvsketch.kmv_intersection(a, b, 64).collect()[0]
    assert abs(r.union_est - 5000) / 5000 < 3 / (64 ** 0.5), r
    # intersection carries both union error and matched-fraction error
    assert abs(r.intersection_est - 1000) / 1000 < 0.5, r


def test_hll_rollup_union_tolerances(spark):
    """HLL union over per-day partials vs the direct whole-range sketch:
    bit-identical only in the sparse regime; once partials go dense the
    union drifts within the HLL error envelope (measured at sf0.1: union
    1488, direct 1494, exact 1500). Assert the TOLERANCES, not equality —
    |union-direct| <= 1% of exact and both within 5% of exact — at both a
    sparse SF and (when present) the dense sf0.1."""
    import os

    from fest_vibes_ai_etl_spark.plans.catalog import REGISTRY, queries

    queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        if not os.path.isdir(sf):
            continue
        for r in REGISTRY["sketch_hll_rollup_eval"].fn(spark, sf).collect():
            assert abs(r.est_union - r.est_direct) <= 0.01 * r.exact_users, r
            assert abs(r.est_direct - r.exact_users) <= 0.05 * r.exact_users, r
            assert abs(r.est_union - r.exact_users) <= 0.05 * r.exact_users, r
