"""Property-based tests (hypothesis): the invariants the engine's semantics
rest on, checked against independent reference implementations (pandas) on
randomized inputs rather than hand-picked fixtures."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators.asof import asof_join
from fest_vibes_ai_etl_spark.operators.merge import first_wins, merge_coalesce

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

row = st.tuples(
    st.integers(0, 6),  # id
    st.one_of(st.none(), st.text("ab", min_size=1, max_size=3)),
    st.one_of(st.none(), st.integers(-5, 5)),
)
rows = st.lists(row, min_size=0, max_size=10)


def _df(spark, rws):
    return spark.createDataFrame(
        [(i, s, v if v is None else float(v)) for i, s, v in rws],
        "id long, s string, v double",
    )


@SET
@given(t=rows, s=rows)
def test_merge_coalesce_idempotent_and_total(spark, t, s):
    """merge(merge(T,S),S) ≡ merge(T,S); output keys = keys(T) ∪ keys(S);
    no output column is null if either side had a value (coalesce totality)."""
    # one row per key on each side (merge contract)
    t = list({r[0]: r for r in t}.values())
    s = list({r[0]: r for r in s}.values())
    tdf, sdf = _df(spark, t), _df(spark, s)
    once = merge_coalesce(tdf, sdf, keys=["id"])
    twice = merge_coalesce(once, sdf, keys=["id"])
    r1 = sorted(map(tuple, once.collect()))
    r2 = sorted(map(tuple, twice.collect()))
    assert r1 == r2
    assert {r[0] for r in r1} == {r[0] for r in t} | {r[0] for r in s}
    tv = {r[0]: r for r in t}
    sv = {r[0]: r for r in s}
    for rid, sval, vval in r1:
        exp_s = (sv.get(rid, (None, None, None))[1]) or (tv.get(rid, (None, None, None))[1])
        assert sval == exp_s


@SET
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=12),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-9, 9)),
        min_size=0,
        max_size=12,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """The union-tag-carry as-of join ≡ pandas.merge_asof (backward) per key."""
    base = dt.datetime(2024, 1, 1)
    # unique (key, ts) per side — merge_asof needs sorted unique-ish input;
    # equal-ts duplicates have engine-defined pick order
    left = list({(k, ts): None for k, ts in left})
    right = list({(k, ts): v for k, ts, v in right}.items())
    ldf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=ts)) for i, (k, ts) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, base + dt.timedelta(seconds=ts), float(v)) for i, ((k, ts), v) in enumerate(right)],
        "rid long, k long, ts timestamp, val double",
    )
    got = {
        r.lid: r.matched_val
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", right_cols=["val"],
            prefix="matched_",
        ).collect()
    }

    if not right:  # merge_asof rejects empty (object-dtype) frames
        exp = {i: None for i, _ in enumerate(left)}
    else:
        lp = pd.DataFrame(
            [(i, k, base + dt.timedelta(seconds=ts)) for i, (k, ts) in enumerate(left)],
            columns=["lid", "k", "ts"],
        ).sort_values("ts")
        rp = pd.DataFrame(
            [(k, base + dt.timedelta(seconds=ts), float(v)) for (k, ts), v in right],
            columns=["k", "ts", "val"],
        ).sort_values("ts")
        exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        exp = {
            int(r.lid): (None if pd.isna(r.val) else float(r.val))
            for r in exp_df.itertuples()
        }
    assert got == exp


@SET
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.text("xy", min_size=1, max_size=2)),
        min_size=1,
        max_size=15,
    )
)
def test_first_wins_matches_pandas(spark, data):
    # unique (key, seq) so the ordering is total and both engines agree
    data = list({(k, seq): s for k, seq, s in data}.items())
    df = spark.createDataFrame(
        [(k, seq, s) for (k, seq), s in data], "k long, seq long, s string"
    )
    got = {(r.k, r.s) for r in first_wins(df, keys=["k"], order_cols=[F.col("seq")]).collect()}
    pdf = pd.DataFrame([(k, seq, s) for (k, seq), s in data], columns=["k", "seq", "s"])
    exp = {
        (int(r.k), r.s)
        for r in pdf.sort_values(["k", "seq"]).groupby("k").first().reset_index().itertuples()
    }
    assert got == exp
