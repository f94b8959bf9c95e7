"""Upsert-engine semantics (SURVEY §2.3 J1-J6) + idempotence property
(/root/reference guarantees via unique indexes, database.py:151-164)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators.merge import (
    first_wins,
    get_or_create,
    merge_coalesce,
    replace_associations,
    surrogate_key,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_coalesce_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a-old", 10.0), (2, None, 20.0), (3, "c-old", None)],
        "id long, name string, score double",
    )
    source = spark.createDataFrame(
        [(2, "b-new", None), (3, None, 33.0), (4, "d-new", 44.0)],
        "id long, name string, score double",
    )
    out = merge_coalesce(target, source, keys=["id"])
    assert _rows(out) == [
        (1, "a-old", 10.0),       # untouched
        (2, "b-new", 20.0),       # name filled, score kept (source null)
        (3, "c-old", 33.0),       # name kept (source null), score filled
        (4, "d-new", 44.0),       # inserted
    ]


def test_merge_overwrite_and_keep_if_null(spark):
    target = spark.createDataFrame(
        [(1, 1.0, "keep-me"), (2, 2.0, None)], "id long, lat double, descr string"
    )
    source = spark.createDataFrame(
        [(1, 9.0, "clobber?"), (2, None, "fill")], "id long, lat double, descr string"
    )
    out = merge_coalesce(
        target, source, keys=["id"], overwrite_cols=["lat"], keep_if_null_cols=["descr"]
    ).select("id", "lat", "descr")
    # lat: always source value when source row exists (J3 geocode overwrite,
    # including source NULL overwriting target value)
    # descr: only filled when target was null (J4 description semantics)
    assert _rows(out) == [(1, 9.0, "keep-me"), (2, None, "fill")]


def test_merge_idempotent(spark):
    target = spark.createDataFrame([(1, "x")], "id long, v string")
    source = spark.createDataFrame([(1, "y"), (2, "z")], "id long, v string")
    once = merge_coalesce(target, source, keys=["id"])
    twice = merge_coalesce(once, source, keys=["id"])
    assert _rows(once) == _rows(twice)


def test_get_or_create_preserves_existing_ids(spark):
    dim = spark.createDataFrame([(100, "Jazz")], "genre_id long, name string")
    new = spark.createDataFrame([("Jazz",), ("Funk",), ("Funk",)], "name string")
    out = get_or_create(dim, new, key_cols=["name"], id_col="genre_id")
    rows = {r.name: r.genre_id for r in out.collect()}
    assert rows["Jazz"] == 100  # existing id untouched
    assert out.count() == 2  # Funk inserted once
    # deterministic surrogate id: equals xxhash64 of the natural key
    expected = spark.range(1).select(surrogate_key(F.lit("Funk"))).first()[0]
    assert rows["Funk"] == expected


def test_replace_associations(spark):
    bridge = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "artist_id long, genre_id long"
    )
    new = spark.createDataFrame([(1, 12)], "artist_id long, genre_id long")
    out = replace_associations(bridge, new, "artist_id")
    # artist 1's rows wholesale replaced; artist 2 untouched
    assert _rows(out) == [(1, 12), (2, 20)]


def test_first_wins_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 2, "second"), ("k", 1, "first"), ("j", 5, "only")],
        "key string, seq int, val string",
    )
    out = first_wins(df, keys=["key"], order_cols=[F.col("seq")])
    assert {(r.key, r.val) for r in out.collect()} == {("k", "first"), ("j", "only")}
