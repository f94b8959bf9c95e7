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


def test_rocchio_recovers_vocabulary_mismatch(spark):
    """A doc that never mentions the seed term but shares the feedback
    docs' vocabulary ('compaction') must enter the expanded ranking —
    the recall-repair property that is Rocchio's reason to exist."""
    from fest_vibes_ai_etl_spark.operators.search import rocchio_expanded_topk

    docs = spark.createDataFrame(
        [
            (1, "merge compaction compaction merge strategy"),
            (2, "merge compaction compaction merge scheduling"),
            (3, "compaction pauses hurt tail latency"),   # no seed term
            (4, "unrelated text about gardening and soil"),
            (5, "merge sort analysis"),
        ],
        "doc_id long, text string",
    )
    postings, doclen = build_postings(docs)
    seed_only = {r.doc_id for r in bm25_topk(postings, doclen, ["merge"], topn=10).collect()}
    assert 3 not in seed_only
    expanded = rocchio_expanded_topk(
        postings, doclen, ["merge"], fb_k=2, expand_n=2, beta=0.5, topn=10
    ).collect()
    ids = {r.doc_id for r in expanded}
    assert 3 in ids          # recovered through the expansion term
    assert 4 not in ids      # noise stays out
    # seed-term docs still outrank the expansion-only doc (beta < 1)
    scores = {r.doc_id: r.score for r in expanded}
    assert scores[1] > scores[3] and scores[2] > scores[3]


def test_rocchio_deterministic_across_runs(spark):
    from fest_vibes_ai_etl_spark.operators.search import rocchio_expanded_topk
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    postings, doclen = build_postings(docs)
    a = rocchio_expanded_topk(postings, doclen, ["merge", "hash"], topn=10).collect()
    b = rocchio_expanded_topk(
        postings.repartition(7), doclen, ["merge", "hash"], topn=10
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_store_steady_state_never_tokenizes(spark):
    """Plan lock for the postings store: once the index is staged, the
    BM25 query must be a pruned parquet scan — no tokenize (Generate
    explode over the split), no corpus re-derivation. This is the
    build/probe split the store exists for; a regression here silently
    reintroduces a full-corpus tokenize per query."""
    from fest_vibes_ai_etl_spark.operators.search import (
        bm25_topk,
        load_or_build_postings_store,
    )
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    load_or_build_postings_store(spark, docs, "/root/testdata/sf0.001")  # stage
    postings, doclen = load_or_build_postings_store(
        spark, docs, "/root/testdata/sf0.001"
    )
    df = bm25_topk(postings, doclen, ["merge", "hash"], topn=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan
    assert "Scan parquet" in plan
    # the query-term prune must reach the store scan as a pushed filter
    assert "term" in plan and "PushedFilters" in plan


def test_python_xxhash64_matches_engine(spark):
    """The driver-side bucket computation (functions/hashing.py) must be
    bit-identical to the engine's xxhash64 — a divergence would make the
    probe silently read the wrong bucket directories. Covers every
    length-class branch (empty, <4, <8, 8-31, ≥32) and non-ASCII."""
    import pyspark.sql.functions as F2

    from fest_vibes_ai_etl_spark.functions.hashing import xxhash64
    from fest_vibes_ai_etl_spark.sources import table

    fixed = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "merge", "hash", "window", "x" * 31, "y" * 32, "z" * 33, "w" * 100,
        "héllo wörld", "日本語テキスト", "emoji 🎉 test",
    ]
    vocab = [
        r.t
        for r in table(spark, "/root/testdata/sf0.001", "documents")
        .selectExpr("explode(split(trim(text), '\\\\s+')) AS t")
        .distinct()
        .limit(300)
        .collect()
    ]
    samples = fixed + vocab
    rows = (
        spark.createDataFrame([(s,) for s in samples], "s string")
        .select("s", F2.xxhash64("s").alias("h"))
        .collect()
    )
    assert rows and all(r.h == xxhash64(r.s) for r in rows)


def test_python_xxhash64_matches_engine_property(spark):
    """Property form of the parity pin: randomized unicode strings
    (seeded — deterministic across runs), compared in ONE batched engine
    round-trip per corpus. Any drift between functions/hashing.py and the
    engine's xxhash64 is a silent wrong-bucket probe; this must fail
    first."""
    import random

    import pyspark.sql.functions as F2

    from fest_vibes_ai_etl_spark.functions.hashing import xxhash64

    rng = random.Random(0xFE57)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789 _-./:#éüßñ中文日本語한글🎉𝔘"
    )
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(400)
    ]
    rows = (
        spark.createDataFrame([(s,) for s in samples], "s string")
        .select("s", F2.xxhash64("s").alias("h"))
        .collect()
    )
    assert len(rows) == 400
    bad = [(r.s, r.h, xxhash64(r.s)) for r in rows if r.h != xxhash64(r.s)]
    assert not bad, bad[:3]


def test_pruned_probe_reads_only_query_buckets(spark):
    """The probe's scan must touch ONLY the query terms' bucket
    directories — checked on the actual files the plan reads, which is
    stronger than a partition-filter string match (explicit-path reads
    prune at listing time)."""
    from fest_vibes_ai_etl_spark.functions.hashing import xxhash64
    from fest_vibes_ai_etl_spark.operators.search import (
        load_or_build_postings_store,
        postings_store_path,
        pruned_postings_for_terms,
    )
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    load_or_build_postings_store(spark, docs, "/root/testdata/sf0.001")
    store = postings_store_path("/root/testdata/sf0.001")
    terms = ["merge", "hash"]
    want_tbs = {f"tb={xxhash64(t) % 64}" for t in terms}
    files = pruned_postings_for_terms(spark, store, terms).inputFiles()
    assert files, "probe read no files"
    touched = {f.rsplit("/postings/", 1)[1].split("/")[0] for f in files}
    assert touched <= want_tbs, (touched, want_tbs)


def test_bm25_probe_partition_prunes_buckets(spark):
    """Plan lock for the round-12 unified layout: the store-backed BM25
    probe must PARTITION-PRUNE on the tb= bucket column (the scan opens
    only the query terms' bucket directories), not merely lean on
    row-group stats."""
    import re

    from fest_vibes_ai_etl_spark.operators.search import (
        load_or_build_postings_store,
        postings_store_path,
    )
    from fest_vibes_ai_etl_spark.sources import table
    from fest_vibes_ai_etl_spark.streaming.incremental_search import bm25_over_index

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    load_or_build_postings_store(spark, docs, "/root/testdata/sf0.001")
    df = bm25_over_index(
        spark, postings_store_path("/root/testdata/sf0.001"), ["merge", "hash"]
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan
    assert re.search(r"PartitionFilters: \[[^\]]*tb#", plan), plan[:2000]


def test_stream_built_index_serves_batch_query_verbatim(spark, tmp_path):
    """One artifact, two builders: a stream-maintained index and a
    batch-staged store over the same corpus answer the shared probe with
    identical rankings — and both match the from-scratch batch scorer."""
    from fest_vibes_ai_etl_spark.operators.search import (
        load_or_build_postings_store,
    )
    from fest_vibes_ai_etl_spark.sources import table
    from fest_vibes_ai_etl_spark.streaming import incremental_search as inc

    docs = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter("doc_id < 140")
    )
    sidx = str(tmp_path / "stream_idx")
    proc = inc.make_search_index_processor(sidx, n_term_buckets=64)
    proc(docs.filter("doc_id < 70"), 0)
    proc(docs.filter("doc_id >= 70"), 1)
    bidx = str(tmp_path / "batch_idx")
    load_or_build_postings_store(
        spark, docs, "/root/testdata/sf0.001", store_path=bidx
    )
    terms = ["merge", "hash", "window"]
    from_stream = [
        tuple(r) for r in inc.bm25_over_index(spark, sidx, terms).collect()
    ]
    from_batch = [
        tuple(r) for r in inc.bm25_over_index(spark, bidx, terms).collect()
    ]
    postings, doclen = build_postings(docs)
    want = [tuple(r) for r in bm25_topk(postings, doclen, terms).collect()]
    assert from_stream == from_batch == want
    # ...and the batch-built store accepts the stream module's ops
    # (delete + maintain) exactly like a stream-built one
    victim = want[0][0]
    assert inc.delete_from_search_index(spark, bidx, [victim]) == 1
    assert victim not in {
        r[0] for r in inc.bm25_over_index(spark, bidx, terms).collect()
    }
    inc.maintain_search_index(spark, bidx, max_files_per_bucket=1)


def test_rocchio_store_steady_state_never_tokenizes(spark):
    """Plan lock: the store-backed Rocchio query's scoring plan must be a
    pruned store scan, never a corpus tokenize (a regression here
    silently reintroduces the full tokenize the store removed). AQE
    fragments actions into many small jobs, so the lock is on the plan
    shape, not job counts."""
    from fest_vibes_ai_etl_spark.operators.search import (
        load_or_build_postings_store,
        rocchio_expanded_topk,
    )
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    load_or_build_postings_store(spark, docs, "/root/testdata/sf0.001")
    postings, doclen = load_or_build_postings_store(
        spark, docs, "/root/testdata/sf0.001"
    )
    df = rocchio_expanded_topk(postings, doclen, ["merge", "hash"], topn=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan
    assert "Scan parquet" in plan
