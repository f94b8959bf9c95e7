"""Behavioral tests for the dedup + similarity operator families on small
synthetic corpora with known ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import dedup, similarity

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over the sleepy dog"),        # near dup of 1
    (4, "completely different text about spark query engines"),
    (5, "the  QUICK  brown fox jumps over the lazy dog"),        # ws/case variant of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates_normalized(docs):
    groups = {r.keep_id: r.n_copies for r in dedup.exact_duplicates(docs, "doc_id", "text").collect()}
    # 1, 2 and 5 collapse (case/whitespace normalization); 3 and 4 singletons
    assert groups[1] == 3
    assert groups[3] == 1
    assert groups[4] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical shingle sets
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_candidates_contain_true_dups(docs):
    pairs = {
        (r.a_id, r.b_id)
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    }
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)


def test_minhash_estimate_close_to_true_jaccard(docs):
    est = {
        (r.a_id, r.b_id): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.0).collect()
    }
    assert est[(1, 2)] == 1.0  # identical sets → identical signatures


def test_simhash_signatures_and_pairs(docs, spark):
    sigs = {r.id: r.simhash for r in dedup.simhash_signatures(docs, "doc_id", "text").collect()}
    ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")  # noqa: E731
    assert ham(1, 2) == 0  # identical token multisets → identical signatures
    assert ham(1, 3) < ham(1, 4)  # one-token edit ≪ unrelated doc
    # the pair operator is self-consistent with the signatures: every
    # returned pair's hamming matches, and all hamming-0 pairs are found
    # (pigeonhole guarantees recall for hamming ≤ 3)
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    for (a, b), h in pairs.items():
        assert ham(a, b) == h
    assert not any(4 in p for p in pairs)


VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
    (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
    (4, [-1.0, 0.0, 0.0, 0.0]),     # opposite
    (5, [0.7, 0.7, 0.0, 0.0]),      # between 1 and 3
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_topk_cosine_ranks_correctly(vecs):
    out = similarity.topk_cosine(vecs, vecs.filter(F.col("vec_id") == 1), k=3)
    got = [(r.vec_id, r.rk) for r in sorted(out.collect(), key=lambda r: r.rk)]
    assert got == [(2, 1), (5, 2), (3, 3)]  # 4 (opposite) excluded from top-3


def test_near_duplicate_pairs_threshold(vecs):
    pairs = {(r.a_id, r.b_id) for r in similarity.near_duplicate_pairs(vecs, threshold=0.99).collect()}
    assert pairs == {(1, 2)}


def test_lsh_near_duplicate_pairs_finds_planted_dup(vecs):
    pairs = {
        (r.a_id, r.b_id)
        for r in similarity.lsh_near_duplicate_pairs(vecs, dim=4, threshold=0.99).collect()
    }
    assert (1, 2) in pairs  # sign signatures identical → same buckets


def test_lsh_recall_vs_exact_on_testdata(spark):
    """LSH candidates must recover every exact pair at the 0.45 threshold on
    the synthetic embeddings (64-dim, 500 vecs)."""
    from fest_vibes_ai_etl_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.a_id, r.b_id)
        for r in similarity.near_duplicate_pairs(emb, threshold=0.45).collect()
    }
    approx = {
        (r.a_id, r.b_id)
        for r in similarity.lsh_near_duplicate_pairs(
            emb, dim=64, threshold=0.45, bits=32, bands=16
        ).collect()
    }
    assert exact, "test premise: some exact pairs exist"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9 ({len(approx)} candidates)"


def test_ngram_jaccard_degree_cap_drops_stop_shingles(spark):
    # 'STOP X Y' is a shingle in every doc (degree 4 > cap 2) and must be
    # dropped from the sets before pairing; docs 1/2 share their remaining
    # shingles exactly, docs 3/4 share nothing after the cap.
    mk = lambda tail: f"STOP X Y {tail}"  # noqa: E731
    rows = [
        (1, mk("a b c d e")),
        (2, mk("a b c d e")),
        (3, mk("p q r s t")),
        (4, mk("u v w x z")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.1, max_shingle_df=2
        ).collect()
    }
    # only the identical pair survives, at jaccard 1.0 on the capped sets
    assert capped == {(1, 2): 1.0}
    # without the cap the shared stop-shingle creates cross pairs too
    # (1 shared of 11 union → jaccard 0.0909)
    uncapped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.05)
    assert {(r.a_id, r.b_id) for r in uncapped.collect()} > {(1, 2)}


def test_choose_rhp_params_recovers_catalog_setting():
    from fest_vibes_ai_etl_spark.operators.similarity import (
        choose_rhp_params,
        rhp_collision_prob,
    )

    # Goemans-Williamson: p = 1 - theta/pi
    assert abs(rhp_collision_prob(1.0) - 1.0) < 1e-12
    assert abs(rhp_collision_prob(0.0) - 0.5) < 1e-12
    assert abs(rhp_collision_prob(-1.0) - 0.0) < 1e-12
    # the catalog's 0.45-threshold setting is the 3e-8-miss solution
    assert choose_rhp_params(0.45, target_miss=3e-8) == (64, 32)
    # tighter thresholds need fewer bands
    b_low = choose_rhp_params(0.45, 1e-6)[1]
    b_high = choose_rhp_params(0.95, 1e-6)[1]
    assert b_high < b_low
    # miss bound actually holds for the returned params
    import math

    for t in (0.45, 0.8, 0.95):
        bits, bands = choose_rhp_params(t, 1e-6)
        p = rhp_collision_prob(t)
        miss = (1 - p ** (bits // bands)) ** bands
        assert miss <= 1e-6 * (1 + 1e-9), (t, miss)


def test_choose_minhash_params_recovers_catalog_setting():
    from fest_vibes_ai_etl_spark.operators.dedup import choose_minhash_params

    # planted-dup regime (J >= 0.889): the catalog's 32/8 setting
    assert choose_minhash_params(0.889, target_miss=1e-3) == (32, 8)
    # the bound holds for the returned params
    for j in (0.6, 0.889):
        nh, bands = choose_minhash_params(j, 1e-3)
        miss = (1 - j ** (nh // bands)) ** bands
        assert miss <= 1e-3 * (1 + 1e-9), (j, miss)
    # low thresholds hit the hash cap rather than exploding
    nh, bands = choose_minhash_params(0.2, 1e-3)
    assert nh <= 256


def test_ngram_jaccard_strategies_identical(spark):
    """count (default) and ppjoin are physically different plans over the
    same signature store; their pair sets and jaccard values must be
    bit-identical at both a low and a high threshold."""
    from fest_vibes_ai_etl_spark.operators import dedup
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    sig = dedup.shingle_signature(docs, "doc_id", "text", 3)
    for t in (0.2, 0.6):
        a = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=t, sig=sig,
            strategy="count").collect()))
        b = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=t, sig=sig,
            strategy="ppjoin").collect()))
        c = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=t, sig=sig,
            strategy="auto").collect()))
        assert a == b == c and len(a) > 0 or t > 0.5


# --- winnowing duplicated-passage detection --------------------------------

PASSAGE = "this exact boilerplate passage is repeated verbatim across documents"


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        # docs 10/11 share PASSAGE but differ everywhere else -> whole-doc
        # similarity is low, substring dedup must still catch them
        (10, "alpha beta gamma delta " + PASSAGE + " epsilon zeta eta theta iota kappa"),
        (11, "one two three four five six " + PASSAGE + " seven eight nine ten eleven"),
        # doc 12: no shared span >= 34 chars with any other doc
        (12, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"),
        # doc 13: too short for any full window
        (13, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_guarantee_shared_passage_detected(span_docs):
    # winnowing guarantee: a shared span of >= w + k - 1 chars yields at
    # least one shared fingerprint; PASSAGE is 68 chars >> 20 + 15 - 1
    pairs = {
        (r.a_id, r.b_id): r.n_shared
        for r in dedup.duplicate_span_pairs(
            span_docs, "doc_id", "text", k=20, w=15, min_shared=1
        ).collect()
    }
    assert (10, 11) in pairs and pairs[(10, 11)] >= 1
    assert (10, 12) not in pairs and (11, 12) not in pairs


def test_winnow_pair_invisible_to_whole_doc_jaccard(span_docs):
    # the same pair scores below the document-level near-dup threshold:
    # this is the capability gap the substring family exists to close
    jac = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            span_docs, "doc_id", "text", k=3, threshold=0.0
        ).collect()
    }
    assert jac.get((10, 11), 0.0) < 0.45


def test_winnow_short_doc_emits_nothing(span_docs):
    fps = dedup.winnow_fingerprints(span_docs, "doc_id", "text", k=20, w=15)
    assert fps.filter(F.col("id") == 13).count() == 0


def test_winnow_density_bound(span_docs):
    # expected density is 2/(w+1); allow generous slack but assert the
    # index is a small fraction of the gram count (the scale economics)
    k, w = 8, 15
    doc10 = span_docs.filter(F.col("doc_id") == 10)
    txt = doc10.collect()[0].text.lower()
    n_grams = len(" ".join(txt.split())) - k + 1
    n_fp = dedup.winnow_fingerprints(doc10, "doc_id", "text", k=k, w=w).count()
    assert n_fp <= n_grams * 4 / (w + 1)


def test_winnow_max_fp_df_drops_boilerplate(spark):
    # passage shared by MANY docs: with max_fp_df below the replica count
    # every pair disappears (boilerplate is litter to report pairwise)
    rows = [(i, f"prefix number {i} " + PASSAGE + f" suffix word {i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    loose = dedup.duplicate_span_pairs(df, "doc_id", "text", k=20, w=15, min_shared=1)
    assert loose.count() > 0
    tight = dedup.duplicate_span_pairs(
        df, "doc_id", "text", k=20, w=15, min_shared=1, max_fp_df=4
    )
    assert tight.count() == 0


def test_winnow_matches_pure_python_reference(spark):
    # ties the operator to the spec the hypothesis suite verifies
    # (tests/test_properties.py::_ref_winnow — same md5-prefix hash)
    from test_properties import _ref_winnow

    rows = [
        (1, "alpha beta gamma delta " + PASSAGE),
        (2, "  MIXED   Case   And   Runs  of spaces in this one  "),
        (3, PASSAGE + " trailing words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 8, 4
    got = {}
    for r in dedup.winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect():
        got.setdefault(r.id, set()).add(r.fp)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _ref_winnow(text, k, w), doc_id


def test_winnow_null_and_empty_text_safe(spark):
    rows = [(1, None), (2, ""), (3, "   "), (4, "a real document long enough to fingerprint with twenty-char grams")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.winnow_fingerprints(df, "doc_id", "text", k=20, w=15)
    ids = {r.id for r in fps.collect()}
    assert ids == {4}  # null/empty/whitespace emit nothing, no crash
    pairs = dedup.duplicate_span_pairs(df, "doc_id", "text", k=20, w=15, min_shared=1)
    assert pairs.count() == 0


def test_verify_span_pairs_sound_bound_on_testdata(spark):
    # soundness over REAL data: every reported pair shares >= min_shared
    # fingerprints, i.e. shared K-GRAMS — the SOUND bound is lcs_len >= k
    # (NOT w + k - 1: that guarantee runs the other direction; a pair
    # sharing only scattered 20-char grams is a legitimate report)
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    pairs = dedup.duplicate_span_pairs(
        docs, "doc_id", "text", k=20, w=15, min_shared=3, max_fp_df=20
    )
    verified = dedup.verify_span_pairs(docs, pairs, "doc_id", "text").collect()
    assert len(verified) == pairs.count()  # nothing silently dropped
    assert all(r.lcs_len is not None and r.lcs_len >= 20 for r in verified), sorted(
        (r.a_id, r.b_id, r.lcs_len) for r in verified if (r.lcs_len or 0) < 20
    )


def test_verify_span_pairs_short_gram_pair_is_legitimate(spark):
    # counterexample to the w+k-1 misreading: two docs sharing exactly one
    # 20-char substring (and nothing longer) are reported at min_shared=1
    # and verify to lcs_len in [20, 34) — a real pair, not a collision
    from test_properties import _ref_winnow

    gram = "abcdefghijklmnopqrst"  # 20 chars
    # a single shared gram is only REPORTED when winnowing happens to
    # select it as a window-min in both docs — search contexts with the
    # pure-python mirror until one qualifies (deterministic: fixed list)
    for i in range(200):
        a = f"xx{i}a xx{i}b " + gram + f" xx{i}c xx{i}d xx{i}e xx{i}f"
        b = f"yy{i}a yy{i}b " + gram + f" yy{i}c yy{i}d yy{i}e yy{i}f"
        if _ref_winnow(a, 20, 15) & _ref_winnow(b, 20, 15):
            break
    else:  # pragma: no cover
        raise AssertionError("no qualifying context found in 200 tries")
    rows = [(1, a), (2, b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.duplicate_span_pairs(df, "doc_id", "text", k=20, w=15, min_shared=1)
    v = dedup.verify_span_pairs(df, pairs, "doc_id", "text").collect()
    assert len(v) == 1 and v[0].a_id == 1 and v[0].b_id == 2
    assert 20 <= v[0].lcs_len < 34


def test_verify_span_pairs_missing_doc_is_null_not_dropped(spark, span_docs):
    pairs = dedup.duplicate_span_pairs(
        span_docs, "doc_id", "text", k=20, w=15, min_shared=1
    )
    subset = span_docs.filter(F.col("doc_id") != 11)  # drop one side
    v = {(r.a_id, r.b_id): r.lcs_len for r in dedup.verify_span_pairs(
        subset, pairs, "doc_id", "text").collect()}
    assert (10, 11) in v and v[(10, 11)] is None  # surfaced, not dropped


def test_verify_span_pairs_exact_length_on_planted_passage(spark, span_docs):
    pairs = dedup.duplicate_span_pairs(
        span_docs, "doc_id", "text", k=20, w=15, min_shared=1
    )
    v = {(r.a_id, r.b_id): r.lcs_len for r in dedup.verify_span_pairs(
        span_docs, pairs, "doc_id", "text").collect()}
    # the planted passage is embedded with one leading+trailing space of
    # shared context; the exact LCS must be at least the passage length
    assert v[(10, 11)] >= len(PASSAGE)


def test_winnow_chunking_invariant_fps_and_pairs(spark):
    """max_doc_chars (the long-doc skew guard) must not change the
    fingerprint set or the mined pairs — including a planted passage that
    STRADDLES a chunk boundary."""
    import random

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    passage = "shared duplicated passage straddling the chunk boundary here"
    big_a = "".join(rng.choice(alpha) for _ in range(3950)) + passage + "".join(
        rng.choice(alpha) for _ in range(3000)
    )  # passage spans the 4096 boundary for max_doc_chars=4096
    small_b = "some unrelated prefix " + passage + " and an unrelated suffix"
    df = spark.createDataFrame(
        [(1, big_a), (2, small_b)], "doc_id long, text string"
    )
    k, w = 20, 15
    plain = {
        (r.id, r.fp)
        for r in dedup.winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    }
    chunked = {
        (r.id, r.fp)
        for r in dedup.winnow_fingerprints(
            df, "doc_id", "text", k=k, w=w, max_doc_chars=4096
        ).collect()
    }
    assert plain == chunked
    p_plain = {
        (r.a_id, r.b_id)
        for r in dedup.duplicate_span_pairs(
            df, "doc_id", "text", k=k, w=w, min_shared=1
        ).collect()
    }
    p_chunked = {
        (r.a_id, r.b_id)
        for r in dedup.duplicate_span_pairs(
            df, "doc_id", "text", k=k, w=w, min_shared=1, max_doc_chars=4096
        ).collect()
    }
    assert p_plain == p_chunked == {(1, 2)}


def test_winnow_chunking_rejects_undersized_chunks(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_doc_chars"):
        dedup.winnow_fingerprints(
            df, "doc_id", "text", k=20, w=15, max_doc_chars=33
        )


def test_verify_span_pairs_equals_difflib_on_test_corpus(spark):
    """The rolling-hash binary-search LCS must be EXACTLY difflib's
    longest-matching-block on every reported pair of the test corpus —
    exactness is the whole contract of the verify step."""
    from difflib import SequenceMatcher

    from fest_vibes_ai_etl_spark.functions.text import normalize_text
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    pairs = dedup.duplicate_span_pairs(
        docs, "doc_id", "text", k=20, w=15, min_shared=1, max_fp_df=20
    )
    got = {
        (r.a_id, r.b_id): r.lcs_len
        for r in dedup.verify_span_pairs(docs, pairs, "doc_id", "text").collect()
    }
    norm = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", normalize_text(F.col("text")).alias("t")
        ).collect()
    }
    assert got
    for (a_id, b_id), lcs in got.items():
        a, b = norm[a_id], norm[b_id]
        m = SequenceMatcher(None, a, b, autojunk=False)
        want = m.find_longest_match(0, len(a), 0, len(b)).size
        assert lcs == want, (a_id, b_id, lcs, want)


def test_lcs_kernel_collision_fallback_is_exact():
    """Execute the hash-collision fallback the docstring promises is safe.
    Under the production 64-bit base a collision is ~2^-64-rare, so the
    test injects base=1, collapsing a window's hash to its codepoint SUM:
    every anagram pair collides, and both fallback outcomes run —

    - "abXba" vs "baYab" at L=2: the first-occurrence pair is the
      colliding non-match ("ab" vs "ba"), so only the exhaustive fallback
      loop can find the TRUE match ("ab" appears in both) — a wrong
      fallback would report lcs 1;
    - the same pair at L=3: every window collides by sum but none match,
      so the fallback must exhaust and say no — a wrong fallback would
      report lcs ≥ 3.

    Then fuzz: on a 3-letter alphabet base=1 collides constantly, and the
    degenerate kernel must still equal difflib (and the production-base
    kernel) everywhere."""
    import random
    from difflib import SequenceMatcher

    import numpy as np

    from fest_vibes_ai_etl_spark.operators.dedup import _lcs_kernel

    def ref(a, b):
        m = SequenceMatcher(None, a, b, autojunk=False)
        return m.find_longest_match(0, len(a), 0, len(b)).size

    old = np.seterr(over="ignore")
    try:
        k_prod = _lcs_kernel()
        k_degen = _lcs_kernel(base=1)
        assert k_degen("abXba", "baYab") == ref("abXba", "baYab") == 2
        assert k_degen("ab", "ba") == 1
        rng = random.Random(20260815)
        for _ in range(120):
            a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 30)))
            b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 30)))
            want = ref(a, b)
            assert k_degen(a, b) == want, (a, b, want)
            assert k_prod(a, b) == want, (a, b, want)
    finally:
        np.seterr(**old)


def test_verify_span_pairs_megabyte_docs_bounded_time(spark):
    """The verdict's planted case: two ~1 MB docs in one pair must verify
    in bounded time (the difflib O(|a|·|b|) scan this replaced would need
    ~10^12 character comparisons — hours)."""
    import random
    import time

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    a = "".join(rng.choice(alpha) for _ in range(1_000_000))
    b = "".join(rng.choice(alpha) for _ in range(990_000))
    planted = a[200_000:205_000]
    b = b[:400_000] + planted + b[400_000:]
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2, 1, 0.1)], "a_id long, b_id long, n_shared long, overlap double"
    )
    t0 = time.time()
    v = dedup.verify_span_pairs(df, pairs, "doc_id", "text").collect()
    wall = time.time() - t0
    # normalize_text collapses the planted span's runs of spaces, so the
    # exact LCS can exceed 5000 slightly via shared context — bound below
    assert len(v) == 1 and v[0].lcs_len >= 4900
    assert wall < 120, f"1MB-pair verify took {wall:.0f}s"


def test_winnow_store_fp_df_matches_recount(spark):
    # the v2 store invariant: the staged corpus-wide fp_df equals a fresh
    # count over the store's own rows (the map-side cutoff depends on it)
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    store = dedup.load_or_build_winnow_store(spark, docs, "/root/testdata/sf0.001", k=20, w=15)
    assert "fp_df" in store.columns
    recount = store.groupBy("fp").count().withColumnRenamed("count", "n")
    bad = (
        store.select("fp", "fp_df").distinct()
        .join(recount, "fp")
        .filter(F.col("fp_df") != F.col("n"))
        .count()
    )
    assert bad == 0


def test_containment_detects_partial_copy(spark):
    """A short doc lifted verbatim into a much longer one: Jaccard is tiny
    (|A|/|B|) but containment(src→dst) is 1.0 — the asymmetric measure's
    reason to exist. Direction matters: the long doc is NOT contained in
    the short one."""
    filler = " ".join(f"filler{i} word{i} token{i}" for i in range(40))
    short = "the quoted passage appears verbatim inside the longer document"
    rows = [(1, short), (2, filler + " " + short + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.src_id, r.dst_id): r.containment
        for r in dedup.containment_pairs(
            df, "doc_id", "text", k=3, threshold=0.5, persist=False
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (2, 1) not in pairs
    jac = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.5, persist=False
    ).collect()
    assert jac == []  # symmetric Jaccard misses the same pair


def test_containment_strategies_identical(spark):
    """count and prefix are physically different plans; their directed pair
    sets and rounded containment values must be bit-identical at a low and
    a high threshold."""
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    sig = dedup.shingle_signature(docs, "doc_id", "text", 3)
    for t in (0.3, 0.8):
        a = sorted(map(tuple, dedup.containment_pairs(
            docs, "doc_id", "text", k=3, threshold=t, sig=sig,
            persist=False, strategy="count").collect()))
        b = sorted(map(tuple, dedup.containment_pairs(
            docs, "doc_id", "text", k=3, threshold=t, sig=sig,
            persist=False, strategy="prefix").collect()))
        c = sorted(map(tuple, dedup.containment_pairs(
            docs, "doc_id", "text", k=3, threshold=t, sig=sig,
            persist=False, strategy="auto").collect()))
        assert a == b == c
        if t == 0.3:
            assert len(a) > 0


def test_containment_bounded_by_one_and_directed(spark):
    from fest_vibes_ai_etl_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    rows = dedup.containment_pairs(
        docs, "doc_id", "text", k=3, threshold=0.2, persist=False
    ).collect()
    assert all(0.2 <= r.containment <= 1.0 for r in rows)
    assert all(r.src_id != r.dst_id for r in rows)
