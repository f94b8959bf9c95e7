"""Training-set assembly operators: split leakage control, decontamination,
token-budget packing, scalable global positions, mixture resampling.
(Cross-engine value parity for the declared queries is covered by
test_oracle_parity; these are the semantic properties.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import trainprep


def _docs(spark):
    rows = [
        (i, f"src{i % 7}", "en" if i % 3 else "de", " ".join(f"w{(i * j) % 11}" for j in range(1, 20)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")


def test_split_is_group_consistent_and_covering(spark):
    docs = _docs(spark)
    out = docs.select("source", trainprep.assign_split(F.col("source")).alias("split"))
    per_source = out.groupBy("source").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r.k == 1 for r in per_source)  # no source straddles splits
    assert {r.split for r in out.select("split").distinct().collect()} <= {"train", "val", "test"}


def test_split_proportions_roughly_hold(spark):
    # many independent keys -> hash split converges to 80/10/10
    keys = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    frac = (
        keys.select(trainprep.assign_split(F.col("k")).alias("s"))
        .groupBy("s").count().collect()
    )
    shares = {r.s: r["count"] / 5000 for r in frac}
    assert abs(shares.get("train", 0) - 0.8) < 0.03
    assert abs(shares.get("val", 0) - 0.1) < 0.02
    assert abs(shares.get("test", 0) - 0.1) < 0.02


def test_decontaminate_flags_planted_overlap(spark):
    rows = [
        (1, False, "alpha beta gamma delta epsilon zeta"),
        (2, False, "one two three four five six seven"),
        (3, True, "alpha beta gamma delta other words here"),  # shares a 4-gram with 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, ev boolean, text string")
    out = trainprep.decontaminate(df, F.col("ev"), "doc_id", "text", k=4).collect()
    assert [(r.doc_id, r.n_eval_matches) for r in out] == [(1, 1)]


def test_pack_budget_matches_sequential_reference(spark):
    docs = _docs(spark).select(
        "doc_id", "lang", F.size(F.split("text", r"\s+")).alias("n_tok")
    )
    got = {
        r.doc_id: r.bin
        for r in trainprep.pack_budget(docs, "lang", "doc_id", "n_tok", budget=100).collect()
    }
    # sequential reference: per-lang running sum, bin = floor(cum_before/budget)
    want = {}
    for lang in ("en", "de"):
        cum = 0
        for r in sorted(docs.filter(F.col("lang") == lang).collect(), key=lambda r: r.doc_id):
            want[r.doc_id] = cum // 100
            cum += r.n_tok
    assert got == want


def test_global_positions_is_a_sorted_permutation(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    key = F.md5(F.col("doc_id").cast("string"))
    out = trainprep.global_positions(df, key).select("doc_id", "pos").collect()
    assert sorted(r.pos for r in out) == list(range(1000))
    # pos order must agree with key order
    by_key = sorted(out, key=lambda r: __import__("hashlib").md5(str(r.doc_id).encode()).hexdigest())
    assert [r.pos for r in by_key] == list(range(1000))


def test_mixture_resample_downsamples_to_targets(spark):
    docs = _docs(spark)  # ~2/3 en, ~1/3 de
    targets = {"en": 0.5, "de": 0.5}
    rates = {r.lang: (r.n, r.rate) for r in trainprep.mixture_rates(docs, "lang", targets).collect()}
    # de is the scarce group: kept fully (rate 1.0); en downsampled to match
    assert rates["de"][1] == pytest.approx(1.0)
    assert 0 < rates["en"][1] < 1
    kept = trainprep.mixture_resample(docs, "lang", targets, "doc_id").groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in kept}
    assert counts["de"] == rates["de"][0]  # downsample-only: scarce group untouched
    assert counts["en"] <= rates["en"][0]
    # achieved mix near 50/50 (hash thinning is uniform, tolerance for 200 docs)
    share_en = counts["en"] / (counts["en"] + counts["de"])
    assert abs(share_en - 0.5) < 0.12


def test_resample_is_deterministic(spark):
    docs = _docs(spark)
    targets = {"en": 0.5, "de": 0.5}
    a = {r.doc_id for r in trainprep.mixture_resample(docs, "lang", targets, "doc_id").collect()}
    b = {r.doc_id for r in trainprep.mixture_resample(docs, "lang", targets, "doc_id").collect()}
    assert a == b


# --- DSIR importance selection ---------------------------------------------


def _dsir_docs(spark):
    # target: 10 docs of "science" vocabulary; pool: 20 science-like docs
    # (should be selected) + 20 sports docs (should not)
    sci = "quantum particle theory energy experiment measurement physics laboratory"
    spo = "football match goal player season league stadium referee"
    rows = (
        [(i, "target", sci + f" extra{i}") for i in range(10)]
        + [(100 + i, "pool", sci + f" filler{i} variant{i}") for i in range(20)]
        + [(200 + i, "pool", spo + f" filler{i} variant{i}") for i in range(20)]
    )
    return spark.createDataFrame(rows, "doc_id long, kind string, text string")


def test_dsir_ranks_target_like_docs_first(spark):
    docs = _dsir_docs(spark)
    out = trainprep.dsir_select(
        docs, F.col("kind") == "target", "doc_id", "text", m=256, top_n=20
    ).collect()
    selected = {r.id for r in out}
    assert selected == {100 + i for i in range(20)}  # exactly the science pool
    assert all(r.score is not None for r in out)


def test_dsir_scores_exclude_target_rows(spark):
    docs = _dsir_docs(spark)
    scored = trainprep.dsir_scores(docs, F.col("kind") == "target", "doc_id", "text", m=256)
    ids = {r.id for r in scored.collect()}
    assert ids == {100 + i for i in range(20)} | {200 + i for i in range(20)}


def test_dsir_deterministic_across_repartition(spark):
    docs = _dsir_docs(spark)
    a = trainprep.dsir_select(docs, F.col("kind") == "target", "doc_id", "text", m=256, top_n=40)
    b = trainprep.dsir_select(
        docs.repartition(13), F.col("kind") == "target", "doc_id", "text", m=256, top_n=40
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_dsir_resample_diversifies_but_respects_scores(spark):
    docs = _dsir_docs(spark)
    pred = F.col("kind") == "target"
    top = {r.id for r in trainprep.dsir_select(docs, pred, "doc_id", "text", m=256, top_n=10).collect()}
    res = trainprep.dsir_resample(docs, pred, "doc_id", "text", m=256, top_n=10).collect()
    sampled = {r.id for r in res}
    # gumbel noise perturbs the selection (different set than raw top-k
    # with overwhelming probability given 40 candidates)...
    assert sampled != top
    # ...but the score gradient still dominates: science-pool docs (which
    # beat sports docs by a wide score margin) stay the majority
    assert len(sampled & {100 + i for i in range(20)}) >= 7
    # keys strictly ordered by rank
    keys = [r.key for r in sorted(res, key=lambda r: r.rank)]
    assert keys == sorted(keys, reverse=True)


def test_dsir_resample_deterministic_across_repartition(spark):
    docs = _dsir_docs(spark)
    pred = F.col("kind") == "target"
    a = trainprep.dsir_resample(docs, pred, "doc_id", "text", m=256, top_n=15)
    b = trainprep.dsir_resample(docs.repartition(11), pred, "doc_id", "text", m=256, top_n=15)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_dsir_resample_temperature_widens_selection(spark):
    docs = _dsir_docs(spark)
    pred = F.col("kind") == "target"
    cold = {r.id for r in trainprep.dsir_resample(docs, pred, "doc_id", "text", m=256, top_n=10, temperature=0.1).collect()}
    hot = {r.id for r in trainprep.dsir_resample(docs, pred, "doc_id", "text", m=256, top_n=10, temperature=50.0).collect()}
    sci = {100 + i for i in range(20)}
    # near-zero T ≈ raw top-k (score dominates); huge T ≈ uniform sample
    # (noise dominates) — the sports pool must leak in at high T
    assert len(cold & sci) >= len(hot & sci)
    assert len(hot - sci) > 0


def test_dsir_store_path_equivalent_to_inline(spark, tmp_path):
    # the persisted term-bucket store (target-independent) must give the
    # same scores as the inline flagged explode
    docs = _dsir_docs(spark)
    pred = F.col("kind") == "target"
    inline = trainprep.dsir_scores(docs, pred, "doc_id", "text", m=256)
    tb = trainprep._term_buckets(docs, "doc_id", "text", F.lit(False), 256).select("id", "b")
    store = str(tmp_path / "tb")
    tb.write.parquet(store)
    via_store = trainprep.dsir_scores(
        docs, pred, "doc_id", "text", m=256, tb=spark.read.parquet(store)
    )
    a = sorted(tuple(r) for r in inline.collect())
    b = sorted(tuple(r) for r in via_store.collect())
    assert a == b


def test_token_weighted_mixture_converges_on_token_share(spark):
    # en docs are 3x longer than de docs: a doc-count mixture overshoots
    # en's token share; the token-weighted rates must hit ~50/50 tokens
    rows = [(i, "en", " ".join(f"e{i}w{j}" for j in range(30))) for i in range(300)] + [
        (1000 + i, "de", " ".join(f"d{i}w{j}" for j in range(10))) for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string").withColumn(
        "nt", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    targets = {"en": 0.5, "de": 0.5}
    kept = trainprep.mixture_resample(docs, "lang", targets, "doc_id", weight_col="nt")
    shares = {
        r.lang: r.tok for r in kept.groupBy("lang").agg(F.sum("nt").alias("tok")).collect()
    }
    total = sum(shares.values())
    assert abs(shares["en"] / total - 0.5) < 0.08
    # the doc-count variant on the same data misses the token target badly
    kept_doc = trainprep.mixture_resample(docs, "lang", targets, "doc_id")
    sd = {
        r.lang: r.tok
        for r in kept_doc.groupBy("lang").agg(F.sum("nt").alias("tok")).collect()
    }
    assert sd["en"] / (sd["en"] + sd["de"]) > 0.65


def test_dsir_null_and_empty_text_safe(spark):
    rows = [
        (1, "target", None),
        (2, "target", "science physics quantum words here"),
        (3, "pool", ""),
        (4, "pool", "science physics quantum experiment"),
        (5, "pool", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, kind string, text string")
    out = trainprep.dsir_scores(docs, F.col("kind") == "target", "doc_id", "text", m=64)
    got = {r.id for r in out.collect()}
    # null-text rows explode to zero terms and simply don't score; the
    # empty string tokenizes to one '' token (scored) — no crash either way
    assert 4 in got and 5 not in got and 1 not in got


def test_token_counts_fallback_matches_bpe_ish_and_fake_counter_plumbing(spark):
    """The tokenizer seam's FALSE branch: counter=None must be exactly the
    bpe_ish column expression (the oracle-hashed default), and a fake
    batched counter must flow through the mapInPandas plumbing into
    pack_budget — pinning the Spark side without the real package (the
    realdeps lane executes the TRUE branch)."""
    from fest_vibes_ai_etl_spark.operators.textanalysis import (
        bpe_ish_token_count,
        token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "en", "hello, world 42 times"),
         (2, "en", "a much longer document with more words and punctuation!"),
         (3, "de", "und noch ein dokument"),
         (4, "en", None)],
        "doc_id long, lang string, text string",
    )
    default = {r.doc_id: r.n_tokens for r in token_counts(docs, "doc_id", "text").collect()}
    legacy = {r.doc_id: r.n_pieces for r in bpe_ish_token_count(docs, "doc_id", "text").collect()}
    assert default == legacy
    # the NULL invariant must hold by construction (explicit passthrough),
    # not via the session's ansi/sizeOfNull conf
    assert default[4] is None

    def fake_counter(texts):
        import pandas as pd

        return pd.Series(
            [0 if t is None else len(str(t).split()) for t in texts],
            index=texts.index, dtype="int64",
        )

    nt = token_counts(docs, "doc_id", "text", counter=fake_counter)
    got = {r.doc_id: r.n_tokens for r in nt.collect()}
    # NULL text is NULL on the counter path too (the wrapper masks it), so
    # pack_budget's window sum treats null rows identically on both paths
    assert got == {1: 4, 2: 9, 3: 4, 4: None}
    packed = trainprep.pack_budget(
        docs.join(nt, "doc_id"), "lang", "doc_id", "n_tokens", budget=8
    )
    bins = {r.doc_id: r.bin for r in packed.collect()}
    assert bins[1] == 0 and bins[2] == 0 and bins[3] == 0


def test_pack_capacity_matches_pure_python_fold(spark):
    """Spark's per-group applyInPandas fold must agree row-for-row with the
    module-level nfd_fold mirror on every group."""
    rows = [(i, i % 3, 1 + (i * 37) % 900) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, g int, w long")
    out = trainprep.pack_capacity(df, ["g"], "id", "w", 1000).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.g, []).append(r)
    for g, rs in by_group.items():
        rs = sorted(rs, key=lambda r: (-r.w, r.id))
        expect = trainprep.nfd_fold([r.w for r in rs], 1000)
        assert [r.bin for r in rs] == expect


def test_pack_capacity_no_bin_overflows(spark):
    """No bin exceeds capacity unless it is a single oversized row; bins
    are contiguous 0..max within each group."""
    rows = [(i, 0, w) for i, w in enumerate([2500, 900, 800, 700, 600, 500, 50, 40])]
    df = spark.createDataFrame(rows, "id long, g int, w long")
    out = trainprep.pack_capacity(df, ["g"], "id", "w", 1000).collect()
    fills, members = {}, {}
    for r in out:
        fills[r.bin] = fills.get(r.bin, 0) + r.w
        members[r.bin] = members.get(r.bin, 0) + 1
    for b, tot in fills.items():
        assert tot <= 1000 or members[b] == 1
    assert sorted(fills) == list(range(len(fills)))
    # the oversized row is alone in bin 0 (NFD puts it first)
    assert members[0] == 1 and fills[0] == 2500


def test_pack_capacity_deterministic_under_repartition(spark):
    rows = [(i, i % 5, 1 + (i * 13) % 400) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g int, w long")
    a = sorted(map(tuple, trainprep.pack_capacity(df, ["g"], "id", "w", 777).collect()))
    b = sorted(map(tuple, trainprep.pack_capacity(
        df.repartition(11), ["g"], "id", "w", 777).collect()))
    assert a == b


def test_nfd_fold_property():
    """Pure fold invariants under random weights (hypothesis): monotone
    non-decreasing bins, capacity respected except singleton-oversized,
    never an empty bin."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=1500), min_size=1, max_size=60))
    def check(ws):
        ws = sorted(ws, reverse=True)
        bins = trainprep.nfd_fold(ws, 1000)
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        fills, counts = {}, {}
        for w, b in zip(ws, bins):
            fills[b] = fills.get(b, 0) + w
            counts[b] = counts.get(b, 0) + 1
        for b, tot in fills.items():
            assert tot <= 1000 or counts[b] == 1

    check()
