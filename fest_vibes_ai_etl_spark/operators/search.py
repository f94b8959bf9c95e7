"""Distributed keyword search: inverted-index postings + Okapi BM25 ranking.

The reference's search surface is pgvector ANN plus ILIKE filters
(/root/reference/src/shared/db/queries.py); the lakehouse-native missing
piece is lexical retrieval. This module builds the classical IR structures
as DataFrames:

- **postings** (term, doc_id, tf): the inverted index. At 100 TB this table
  is written bucketed by ``term`` so a query's posting lists are a bucket
  scan, not a full-corpus tokenize.
- **doc lengths** (doc_id, dl) + corpus stats (N, avgdl): the BM25
  normalizers — one tiny aggregate, broadcast to the scorer.

Query-time cost is proportional to the posting lists of the query terms
only (the ``isin`` filter prunes before any shuffle), then one groupBy over
candidate docs. No UDFs anywhere — every score term is a codegen'd column
expression."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import text as T

K1, B = 1.2, 0.75


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Tokenize once, derive the inverted index and per-doc lengths.
    Returns (postings(term, doc_id, tf), doclen(doc_id, dl))."""
    toks = docs.select(F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term"))
    postings = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    return postings, doclen


def corpus_stats_literals(doclen: DataFrame) -> tuple:
    """(n_docs, avgdl) collected once — two scalars, the repo's
    bounded-collect discipline. Passing them to :func:`bm25_topk` (and the
    Rocchio passes) as ``stats`` replaces a per-pass broadcast-subquery
    materialization (an extra Spark job each) with plan literals; the
    values are the same doubles the broadcast row carried (round 14)."""
    row = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return (
        float(row["n_docs"]),
        None if row["avgdl"] is None else float(row["avgdl"]),
    )


def _stats_cols(stats: tuple | None):
    """(n_docs_col, avgdl_col) as literal columns, or None when stats must
    ride a broadcast row (the caller has no collected stats)."""
    if stats is None:
        return None
    n_docs, avgdl = stats
    return (
        F.lit(float(n_docs)),
        F.lit(None).cast("double") if avgdl is None else F.lit(float(avgdl)),
    )


def bm25_topk(
    postings: DataFrame,
    doclen: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    topn: int = 10,
    stats: tuple | None = None,
) -> DataFrame:
    """Top-``topn`` docs for a bag of query terms under classic Okapi BM25
    with the Lucene non-negative idf: idf = ln((N - df + ½)/(df + ½) + 1),
    score = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). Returns
    (doc_id, score) ranked by the 4-decimal-rounded score, doc_id tie-break
    — reproducible across engines and partition counts.

    Round-14 plan shape: per-term df is a WINDOW over the term-partitioned
    hits instead of a broadcast self-aggregate — the pruned posting scan
    runs once, not twice, and one broadcast job disappears; the hits frame
    is bounded by the query terms' posting lists, so the window shuffle is
    query-sized, not corpus-sized. ``stats`` (from
    :func:`corpus_stats_literals`) optionally injects N/avgdl as literals,
    sparing the per-call broadcast materialization of the doclen aggregate;
    both forms produce identical doubles."""
    from pyspark.sql import Window

    hits = postings.filter(F.col("term").isin(terms)).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    lit_stats = _stats_cols(stats)
    if lit_stats is None:
        stats_df = doclen.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        n_docs_c, avgdl_c = F.col("n_docs"), F.col("avgdl")
    else:
        n_docs_c, avgdl_c = lit_stats
    idf = F.log((n_docs_c - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl_c)
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm
    scored = hits.join(doclen, id_col)
    if lit_stats is None:
        scored = scored.crossJoin(broadcast(stats_df))
    scored = scored.groupBy(id_col).agg(
        F.round(F.sum(contrib) + 1e-8, 4).alias("score")
    )
    return scored.orderBy(F.desc("score"), id_col).limit(topn)


def rocchio_expanded_topk(
    postings: DataFrame,
    doclen: DataFrame,
    seed_terms: list[str],
    id_col: str = "doc_id",
    fb_k: int = 5,
    expand_n: int = 5,
    beta: float = 0.5,
    topn: int = 10,
    k1: float = K1,
    b: float = B,
    persist: bool = True,
    pruned=None,
    forward=None,
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio): run BM25 for the seed
    terms, take the top ``fb_k`` docs as assumed-relevant feedback, score
    every non-seed term in them by the Rocchio centroid weight
    idf(t) · Σ_fb tf(t,d), add the ``expand_n`` best as expansion terms at
    weight ``beta``, and re-rank the corpus under the weighted BM25
    score Σ_t w_t · bm25(t, d). Classic recall repair for vocabulary
    mismatch: a doc discussing the topic in different words is invisible
    to the seed query but shares terms with the feedback set.

    Every selection step (feedback docs, expansion terms, final ranking)
    orders by a 4-decimal-rounded score with a total id/term tie-break, so
    the EXPANSION ITSELF — not just the final list — is reproducible
    across engines, reruns, and partitionings.

    Scale shape: the feedback ids (≤ fb_k) and the chosen expansion terms
    (≤ expand_n) are QUERY CONSTANTS — bounded by the query parameters,
    not the data — so both selections COLLECT to the driver and push back
    down as ``isin`` filters on the postings (driver-side sets of k and n
    rows, the repo's bounded-collect discipline). Without that, every
    broadcast materialization re-executes the selection subtree: measured
    12.5 → 3.3 s at sf0.1. Candidate-term corpus df comes
    from one semi-join-pruned postings pass; final scoring touches only
    the ≤ len(seeds)+expand_n query terms' posting lists. Nothing scales
    with |corpus| except the pruned posting scans — the same query-time
    cost model as bm25_topk, ×2 passes.

    ``persist=True`` caches postings + doclen (MEMORY_AND_DISK) for the
    two bounded selection passes, then UNPERSISTS before returning so
    repeated calls in one session cannot leak cache entries — but only
    the entries THIS call created: inputs the caller already persisted
    (persist() returns self, so a second persist would be a no-op and an
    unconditional unpersist would evict the caller's cache) are left
    alone. Uncached, Catalyst re-derives the inputs' full lineage per
    consumer (a corpus tokenize when fed from build_postings). At 100 TB
    the inputs ARE the staged store (load_or_build_postings_store),
    where the persist merely saves re-scans.

    ``pruned`` (optional ``terms -> DataFrame``) supplies the
    term-filtered posting lists for the two by-term passes (the seed BM25
    and the final weighted rescore) — callers on the shared tb= index
    layout pass :func:`pruned_postings_for_terms` so those passes
    PARTITION-PRUNE to the chosen terms' buckets; the candidate-vocabulary
    passes (whose term set is data-derived, not query-derived) stay on the
    full ``postings``. Default: an ``isin`` filter over ``postings``.

    ``forward`` (optional ``doc_ids -> DataFrame(term, id, tf)``) is the
    doc-major escape for the candidate passes: with it, the feedback
    docs' vocabulary comes from ≤ fb_k doc-buckets of the FORWARD
    sidecar (``forward_terms_for_docs``) instead of a full postings
    scan, the candidate terms (bounded by fb_k docs' vocabularies — a
    query constant times max doc length) collect to the driver, and the
    corpus-df pass partition-prunes through ``pruned``. Nothing in the
    query then reads the whole store — the pass that made Rocchio
    corpus-proportional per query is gone. ``postings`` may be None when
    both ``pruned`` and ``forward`` are given.
    """
    if postings is None and pruned is None:
        # loud contract error here beats the opaque NoneType failure the
        # default prune lambda would raise later inside the cdf pass
        raise ValueError(
            "rocchio_expanded_topk: postings=None requires pruned (and "
            "forward) — without a pruned() supplier there is no posting "
            "source for the term passes"
        )
    if postings is None and forward is None:
        raise ValueError(
            "rocchio_expanded_topk: postings=None requires forward — the "
            "candidate-vocabulary pass has no doc-major source without it"
        )
    prune = pruned if pruned is not None else (
        lambda ts: postings.filter(F.col("term").isin(ts))
    )
    ours = []
    if persist:
        from pyspark.storagelevel import StorageLevel

        for frame in (postings, doclen):
            if frame is not None and not frame.is_cached:
                frame.persist(StorageLevel.MEMORY_AND_DISK)
                ours.append(frame)
    spark = doclen.sparkSession
    # N/avgdl collected ONCE (two scalars) and injected as literals into
    # every pass — the three per-pass broadcast materializations of the
    # same doclen aggregate were each their own Spark job (round 14).
    stats_t = corpus_stats_literals(doclen)
    n_docs_c, avgdl_c = _stats_cols(stats_t)
    fb_ids = [
        r[0]
        for r in bm25_topk(
            prune(seed_terms), doclen, seed_terms, id_col, k1, b, topn=fb_k,
            stats=stats_t,
        )
        .select(id_col)
        .collect()
    ]
    idf = F.log((n_docs_c - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)

    if forward is not None:
        # doc-major candidate pass: ≤ fb_k doc-buckets of the forward
        # sidecar, then a driver-side bounded term set pushed back down
        # as a partition-pruned df pass. The centroid Σtf per term is
        # COLLECTED IN THE SAME JOB (long sums — exact either way): the
        # candidate vocabulary is bounded by fb_k docs, so the rows are a
        # query constant, and re-deriving them in the cw pass re-read the
        # forward sidecar once more per query (round 14: one forward read,
        # not two — the stf side re-enters as a driver-local relation).
        cand = forward(fb_ids).filter(~F.col("term").isin(seed_terms))
        stf_agg = cand.groupBy("term").agg(F.sum("tf").alias("stf"))
        cand_rows = stf_agg.collect()
        cand_terms = [r["term"] for r in cand_rows]
        cdf = (
            prune(cand_terms)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        cand_stf = spark.createDataFrame(cand_rows, schema=stf_agg.schema)
    else:
        cand = postings.filter(
            F.col(id_col).isin(fb_ids) & ~F.col("term").isin(seed_terms)
        )
        cdf = (
            postings.join(broadcast(cand.select("term").distinct()), "term")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        cand_stf = cand.groupBy("term").agg(F.sum("tf").alias("stf"))
    cw = (
        cand_stf.join(broadcast(cdf), "term")
        .select("term", F.round(idf * F.col("stf") + 1e-8, 4).alias("w"))
    )
    expansion_terms = [
        r["term"] for r in cw.orderBy(F.desc("w"), "term").limit(expand_n).collect()
    ]
    qw = spark.createDataFrame(
        [(t, 1.0) for t in seed_terms]
        + [(t, float(beta)) for t in expansion_terms],
        "term string, wq double",
    )
    # both bounded selections are collected; drop ONLY the cache entries
    # this call created before building the returned frame
    for frame in ours:
        frame.unpersist()

    # final rescore: df via the same term-window as bm25_topk (one scan of
    # the pruned postings, no broadcast self-aggregate), stats as literals
    from pyspark.sql import Window

    hits = (
        prune(seed_terms + expansion_terms)
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(broadcast(qw), "term")
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl_c)
    contrib = F.col("wq") * idf * F.col("tf") * (k1 + 1.0) / norm
    scored = (
        hits.join(doclen, id_col)
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib) + 1e-8, 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), id_col).limit(topn)


# --- persisted postings store: build once, search many ----------------------
#
# Since round 12 the batch-staged store and the stream-maintained index
# (streaming/incremental_search.py) are ONE artifact layout:
# <store>/_meta.json (n_term_buckets, id_col), <store>/postings/tb=<b>/
# hive term-bucket directories, <store>/doclen. A batch-built store can be
# probed, incrementally maintained, compacted, and tombstone-deleted by
# the stream module's ops, and a stream-built index serves every batch
# lexical query verbatim; probes PARTITION-PRUNE to the query terms'
# buckets instead of leaning on row-group stats (the pre-round-12 flat
# repartition("term") layout's weaker guarantee).


def postings_store_path(sf_dir: str, table_name: str = "documents") -> str:
    """Keyed by (sf basename, source table, source fingerprint) — the
    signature/ivf store convention: a regenerated dataset keys a fresh
    build, never serves stale postings. The ``_tb`` suffix versions the
    round-12 term-bucketed layout (pre-round-12 flat stores at the
    unsuffixed path are orphaned, never misread)."""
    import os

    from ..fingerprint import source_fingerprint

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tag = os.path.basename(sf_dir.rstrip("/")) or "root"
    stamp = "_" + source_fingerprint(os.path.join(sf_dir, f"{table_name}.parquet"))
    return os.path.join(
        repo, "spark-warehouse", "postings", f"{tag}_{table_name}{stamp}_tb"
    )


def load_or_build_postings_store(
    spark,
    docs: DataFrame,
    sf_dir: str,
    table_name: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_buckets: int = 64,
    store_path: str | None = None,
    n_doc_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """The inverted index staged to parquet in the SHARED index layout
    (see the section comment): postings under hive ``tb=`` term-bucket
    directories plus the doclen sidecar, pinned by ``_meta.json``. Built
    once per (sf, table, source fingerprint) and shared by every lexical
    consumer (BM25, Rocchio, RRF, rerank); at 100 TB the corpus tokenize
    is the dominant search cost and this is the standard build/probe
    split — queries become PARTITION-PRUNED columnar scans of their
    terms' buckets (:func:`pruned_postings_for_terms`), never a tokenize
    pass. Returns (postings incl. the ``tb`` column, doclen) for
    consumers that need the full index (Rocchio's candidate passes).

    Write order: doclen, postings, meta LAST — the meta is the load
    gate, so a build interrupted anywhere re-runs whole (overwrite)
    instead of serving a torn store."""
    import os

    path = store_path or postings_store_path(sf_dir, table_name)
    if not os.path.exists(os.path.join(path, "_meta.json")):
        from ..streaming.incremental_search import _check_meta, term_bucket

        postings, doclen = build_postings(docs, id_col, text_col)
        doclen.coalesce(4).write.mode("overwrite").parquet(path + "/doclen")
        (
            postings.withColumn("tb", term_bucket(F.col("term"), n_term_buckets))
            .repartition("tb")
            .write.partitionBy("tb")
            .mode("overwrite")
            .parquet(path + "/postings")
        )
        # meta LAST (the load gate), which also settles the doc-major
        # forward sidecar from the just-written postings
        _check_meta(
            spark, path, n_term_buckets, id_col,
            id_type=docs.schema[id_col].dataType.simpleString(),
            n_doc_buckets=n_doc_buckets,
        )
    else:
        # pre-forward stores (round ≤12 layout) gain the sidecar on
        # first load — one-time, index-proportional, idempotent
        from ..streaming.incremental_search import settle_forward_index

        settle_forward_index(spark, path, n_doc_buckets)
    return (
        spark.read.parquet(path + "/postings"),
        spark.read.parquet(path + "/doclen"),
    )


_SHIM_UNSET = object()  # "not supplied" — distinct from the composite
# convention's None ("caller resolved: nothing to apply")


def pruned_postings_for_terms(
    spark, store_dir: str, terms: list[str], id_col: str = "doc_id",
    tomb=_SHIM_UNSET, revs=_SHIM_UNSET, heal="repair",
) -> DataFrame:
    """Partition-pruned posting lists for a query's terms over the shared
    index layout — the scan opens ≤ |terms| ``tb=`` bucket directories,
    never the whole store (delegates to the stream module's probe
    plumbing, tombstone-aware and crash-heal-aware). ``tomb``/``revs``/
    ``heal`` follow the composite-probe convention (round 14): a caller
    issuing several passes (Rocchio) resolves the tombstone/revision state
    once and hands it to each pass instead of re-deriving it per call."""
    from ..streaming.incremental_search import _UNSET, pruned_postings

    return pruned_postings(
        spark, store_dir, terms, id_col=id_col,
        tomb=_UNSET if tomb is _SHIM_UNSET else tomb,
        revs=_UNSET if revs is _SHIM_UNSET else revs,
        heal=heal,
    )
