"""Training-set assembly operators: deterministic splits, test-set
decontamination, token-budget packing, global deterministic shuffle, and
mixture resampling.

These extend the reference's pipeline (which stops at load + cache,
`src/loader/service.py:1052-1132`) with the downstream steps an LLM
training-data pipeline needs before a corpus is consumable. Every operator
is deterministic — keyed on portable hashes (md5, identical in Spark and
DuckDB) rather than RNG — so reruns, retries, and the correctness oracle
all agree.

Scale notes (100 TB):
- All hash/split/resample decisions are map-side column expressions: no
  shuffle at all until the caller aggregates.
- ``global_positions`` implements a scalable global row index: range-
  partitioned sort, per-partition offsets (one tiny agg over #partitions
  rows, broadcast back), local row_number. No single-partition window.
- ``decontaminate`` broadcasts the (small) eval side's shingles; the train
  side streams map-side until the broadcast-hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

HASH_DENOM = float(1 << 24)  # first 6 md5 hex chars → uniform [0, 1)


def hash_fraction(col: Column, salt: str) -> Column:
    """Deterministic uniform-ish fraction in [0, 1) from a key column.

    Portable across engines: Spark `conv(substr(md5(s),1,6),16,10)` equals
    DuckDB `('0x' || substr(md5(s),1,6))::BIGINT`.
    """
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 6)
    return F.conv(hexpart, 16, 10).cast("long") / F.lit(HASH_DENOM)


def assign_split(key: Column, train: float = 0.8, val: float = 0.1,
                 salt: str = "split-v1:") -> Column:
    """Group-aware train/val/test label: every row with the same key lands
    in the same split (leakage control — e.g. key on ``source`` so one
    crawl domain never straddles train and eval)."""
    frac = hash_fraction(key, salt)
    return (
        F.when(frac < train, F.lit("train"))
        .when(frac < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def decontaminate(
    docs: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Find train docs contaminated by k-word-shingle overlap with the eval
    slice. Returns (id_col, n_shared_shingles, n_eval_matches).

    ``eval_pred`` MUST be deterministic (hash/mod/column predicates — never
    rand()-derived): it is evaluated independently on the two branch
    filters, so a non-deterministic predicate could place a row in both or
    neither branch. (The old single-select shape had the same practical
    requirement through Catalyst's subtree duplication; the API shape now
    makes it explicit — ADVICE r14.)

    The eval side is a small fraction of the corpus, so its exploded
    shingle set is broadcast; the train side never shuffles before the
    join. Filter on the cheap token count, not on the shingle array (the
    pushdown re-inline trap).

    The eval/train split predicate is applied BEFORE tokenizing: Spark
    duplicates the source subtree under the broadcast boundary, and with
    the split applied after tokenization each branch tokenized the FULL
    corpus (the conjunct order put size(split(text)) ahead of the cheap
    predicate) — 2x the corpus' tokenize cost for the same rows. With the
    predicate first, each row is tokenized on exactly one branch."""

    def _shingles(side: DataFrame) -> DataFrame:
        toks = side.select(
            F.col(id_col), T.tokens(F.col(text_col)).alias("tk")
        ).filter(F.size("tk") >= k)
        return toks.select(
            id_col, F.explode(T.word_shingles(F.col("tk"), k)).alias("g")
        )

    train_sh = _shingles(docs.filter(~eval_pred)).select(id_col, "g")
    eval_sh = (
        _shingles(docs.filter(eval_pred))
        .select(F.col(id_col).alias("eval_id"), "g")
        .distinct()
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_matches"),
        )
    )


def pack_budget(
    df: DataFrame,
    part_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row to a fixed-token-budget bin within its partition
    column, in deterministic ``order_col`` order (contiguous packing; a doc
    whose tokens straddle a boundary belongs to the bin its first token
    falls in). Adds ``bin`` (int).

    One shuffle on ``part_col`` for the running-sum window; at scale the
    partition key (language / shard) keeps windows narrow."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("bin", F.floor(cum_before / budget).cast("int"))


def nfd_fold(weights: list[int], capacity: int) -> list[int]:
    """Pure-python mirror of the next-fit bin fold over an ALREADY-ORDERED
    weight sequence: a row that would overflow the open bin closes it and
    opens the next (an oversized first-or-next row gets a bin to itself).
    Kept module-level for property tests; ``pack_capacity`` inlines the
    identical fold inside its applyInPandas closure (executor closures must
    be self-contained — no package refs)."""
    bins: list[int] = []
    b, fill = 0, 0
    for i, wt in enumerate(weights):
        if i == 0:
            fill = wt
        elif fill + wt > capacity:
            b, fill = b + 1, wt
        else:
            fill += wt
        bins.append(b)
    return bins


def pack_capacity(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    capacity: int,
) -> DataFrame:
    """NO-STRADDLE next-fit-decreasing bin packing: within each group,
    rows sort by (weight DESC, id) and fold sequentially — a row that
    would push the open bin past ``capacity`` closes it and opens the
    next. Adds ``bin`` (int). Unlike :func:`pack_budget` (contiguous
    token-budget bins where a doc may straddle a boundary — the
    concat-and-chunk recipe), no bin except a singleton-oversized row
    ever exceeds capacity, which is what sequence packing without
    document truncation requires; decreasing order is the classical
    waste-reducing heuristic (NFD).

    The bin index is a prefix-dependent fold — inherently sequential, not
    expressible with plain windows — so it runs per group inside
    applyInPandas (the custom-operator escape hatch for semantics the
    built-ins can't express). Parallelism and memory are governed by the
    GROUPING: pack within (lang, shard) where shard is a hash bucket, and
    each task folds one bounded shard — the standard industrial
    formulation (packing quality is per-shard; cross-shard waste is at
    most one underfull bin per shard). The fold itself is O(rows) with
    zero Python-loop-per-row Spark overhead — one Arrow batch in, one
    out."""
    import pandas as pd  # noqa: F401  (executors import locally anyway)

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField("bin", IntegerType())])
    asc = [False, True]
    sort_cols = [weight_col, id_col]

    def fn(pdf):
        pdf = pdf.sort_values(sort_cols, ascending=asc, kind="mergesort").reset_index(
            drop=True
        )
        bins = []
        b, fill = 0, 0
        for i, wt in enumerate(pdf[weight_col]):
            if i == 0:
                fill = wt
            elif fill + wt > capacity:
                b, fill = b + 1, wt
            else:
                fill += wt
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        return pdf

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)


def global_positions(df: DataFrame, key: Column) -> DataFrame:
    """Deterministic global shuffle: total order by ``key`` with a global
    0-based ``pos`` — WITHOUT a single-partition window.

    Plan: range-partitioned sort on the key, local row_number per Spark
    partition, then add per-partition offsets (a #partitions-row aggregate,
    broadcast back). This is the scalable zipWithIndex expressed in
    DataFrame ops."""
    keyed = df.withColumn("_k", key).repartitionByRange(F.col("_k")).sortWithinPartitions("_k")
    parts = keyed.withColumn("_pid", F.spark_partition_id())
    local = F.row_number().over(Window.partitionBy("_pid").orderBy("_k")) - 1
    with_local = parts.withColumn("_local", local)
    offsets = (
        with_local.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .withColumn("pos", (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset", "_k")
    )


def mixture_rates(
    df: DataFrame, group_col: str, targets: dict[str, float],
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group deterministic keep-rate achieving a target mixture by
    downsampling only: rate_g = c * w_g / n_g with c = min_g(n_g / w_g)
    (the largest scale at which no group needs upsampling). ``n_g`` is the
    row count, or — with ``weight_col`` — the weight sum: pass a token
    count to hit the mixture in TOKENS, the unit training budgets are
    actually written in (a doc-count mixture over- or under-serves any
    group whose documents run long or short)."""
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(g, float(w)) for g, w in targets.items()], f"{group_col} string, w double"
    )
    n_expr = F.count("*") if weight_col is None else F.sum(weight_col)
    counts = df.groupBy(group_col).agg(n_expr.alias("n")).join(tgt, group_col)
    c = counts.agg(F.min(F.col("n") / F.col("w")).alias("c"))
    return (
        counts.crossJoin(F.broadcast(c))
        .withColumn("rate", F.col("c") * F.col("w") / F.col("n"))
        .select(group_col, "n", "rate")
    )


def mixture_resample(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    id_col: str,
    salt: str = "mix-v1:",
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministically downsample each group to the target mixture: keep a
    row iff hash_fraction(id) < its group's rate. Rates are a tiny
    broadcast; the keep decision is map-side. ``weight_col`` switches the
    mixture unit from documents to that weight (e.g. tokens); kept weight
    per group then converges on rate_g·W_g because the hash keep-decision
    is independent of document length."""
    rates = mixture_rates(df, group_col, targets, weight_col=weight_col).select(
        group_col, "rate"
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_fraction(F.col(id_col), salt) < F.col("rate"))
        .drop("rate")
    )


# --- DSIR: data selection via importance resampling ------------------------
#
# Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling" (NeurIPS): select pretraining documents whose hashed-n-gram
# distribution looks like a small high-quality target corpus. Features are
# bag-of-hashed-{uni,bi}grams into m buckets; target (p) and pool (q)
# bucket distributions are estimated with Laplace smoothing; each pool doc
# scores the sum of per-term log p(b)/q(b). Everything is one term explode
# + one m-row aggregate + one broadcast join — no shuffle wider than the
# term explode the corpus-stats family already pays, and the log-ratio
# table is m rows (broadcast) regardless of corpus size.


def _term_buckets(
    df: DataFrame, id_col: str, text_col: str, flag: Column, m: int
) -> DataFrame:
    """(id, is_t, b) — one row per {uni,bi}gram INSTANCE (multiplicity
    counts, per the paper), bucketed by the portable 48-bit md5 prefix
    mod m. Staged projections (token array first) for the same
    re-evaluation reason as ``_shingle_arrays``."""
    toks = df.select(
        F.col(id_col).alias("id"), flag.alias("is_t"), T.tokens(F.col(text_col)).alias("tk")
    )
    bigrams = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("tk", i.cast("int")), F.element_at("tk", (i + 1).cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    terms = toks.select(
        "id", "is_t", F.explode(F.concat(F.col("tk"), bigrams)).alias("term")
    )
    bucket = F.conv(F.substring(F.md5(F.col("term")), 1, 12), 16, 10).cast("long") % m
    return terms.select("id", "is_t", bucket.alias("b"))


def dsir_term_store_path(sf_dir: str, table_name: str, m: int) -> str:
    import os

    from ..fingerprint import source_fingerprint
    from .dedup import _sig_warehouse_root

    tag = os.path.basename(sf_dir.rstrip("/")) or "root"
    stamp = "_" + source_fingerprint(os.path.join(sf_dir, f"{table_name}.parquet"))
    # "dsirb": v2 stores are BUCKETED by id (Spark bucketed-table layout);
    # the tag bump keeps v1 plain-parquet stores from being registered
    # with a bucket spec their files don't satisfy. The bucket COUNT is
    # part of the path for the same reason m and the source fingerprint
    # are: bucketing is layout, and re-registering existing files under a
    # changed DSIR_STORE_BUCKETS ("size to the cluster at deployment")
    # would declare a spec the files don't satisfy — the shuffle-free id
    # join then silently drops matches. Encoding it forces a rebuild.
    return os.path.join(
        _sig_warehouse_root(),
        f"dsirb_{tag}_{table_name}_m{m}_b{DSIR_STORE_BUCKETS}{stamp}",
    )


DSIR_STORE_BUCKETS = 16


def load_or_build_dsir_term_store(
    spark,
    df: DataFrame,
    sf_dir: str,
    table_name: str = "documents",
    m: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The (id, b) term-bucket table staged as a Spark BUCKETED table —
    the DSIR feature index. Term buckets depend only on (corpus, m), NOT
    on the target predicate, so one build serves every target domain a
    user scores against; the staged rows are two longs per term instance.

    The store is written ``bucketBy(id)`` (16 buckets locally; size to the
    cluster at deployment), so the query-time flag join in ``dsir_scores``
    is SHUFFLE-FREE on the store side — only the m-rows-thin flag frame
    moves, the corpus-sized term explode never re-shuffles
    (plan-locked in tests/test_plans.py). Bucketing metadata lives in the
    session catalog; the parquet files (whose names carry the bucket ids)
    persist under the repo warehouse, so a fresh session — including the
    driver's bare foreign-cwd session — re-registers the EXISTING files as
    an external bucketed table instead of rebuilding."""
    import os
    import re

    path = dsir_term_store_path(sf_dir, table_name, m)
    tbl = "dsir_store_" + re.sub(r"\W+", "_", os.path.basename(path)).lower()
    # id dtype follows the caller's id_col (self-review finding: a
    # hardcoded BIGINT would misregister a store built on a non-bigint id)
    id_type = df.schema[id_col].dataType.simpleString()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tb = _term_buckets(df, id_col, text_col, F.lit(False), m).select("id", "b")
        (
            tb.write.mode("overwrite")
            .bucketBy(DSIR_STORE_BUCKETS, "id")
            .sortBy("id")
            .option("path", path)
            .saveAsTable(tbl)
        )
        return spark.table(tbl)
    if not spark.catalog.tableExists(tbl):
        # files exist from an earlier session; register them (no data move)
        spark.sql(
            f"""
            CREATE TABLE {tbl} (id {id_type}, b BIGINT)
            USING PARQUET
            CLUSTERED BY (id) SORTED BY (id) INTO {DSIR_STORE_BUCKETS} BUCKETS
            LOCATION '{path}'
            """
        )
    return spark.table(tbl)


def dsir_scores(
    df: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str,
    m: int = 1024,
    tb: DataFrame | None = None,
) -> DataFrame:
    """(id, n_terms, score_dec) — DSIR importance score for every POOL doc
    (rows not matching ``target_pred``); higher = more target-like.

    Cross-engine determinism: the per-bucket log-ratio is rounded to 6 dp
    once (m values, so last-ulp ln() divergence between the JVM and any
    SQL oracle has ~m chances to land on a rounding boundary, not one per
    term instance) and cast to DECIMAL(18,6); the per-doc score is then an
    EXACT decimal sum — bit-identical regardless of engine or partition
    order, so rank order is reproducible too. The count/log-ratio tables
    are O(m) rows and broadcast; total term volume is the only large
    shuffle. The term-bucket explode is persisted — it feeds both the
    bucket-count aggregate and the pool-side scoring join, and re-running
    the tokenize+md5 scan (the dominant cost, measured ~2× the query wall)
    is strictly worse than one MEMORY_AND_DISK materialization. Pass
    ``tb`` (from ``load_or_build_dsir_term_store``) to skip the corpus
    scan entirely; the target flag is then joined on by id.

    Cache lifecycle: the persisted term-bucket frame backs the LAZY
    returned plan, so it cannot be unpersisted here — the CALLER owns the
    cache entry and should ``spark.catalog.clearCache()`` (or
    track+unpersist) after materializing when calling repeatedly."""
    from pyspark.storagelevel import StorageLevel

    # Round 14 note: pre-aggregating the store's term instances to
    # per-(id, bucket) counts before the flag join (guide §2.3) was tried
    # and measured ~10% SLOWER in an interleaved A/B at sf0.1 — the extra
    # hash-aggregate pass over 4.4M rows costs more than the ~1.5× row
    # reduction saves downstream at this density. Kept the instance-row
    # plan; revisit only when the bucket collision rate (rows per (id,b))
    # grows well past ~1.5.
    # Round 15 note: replacing the flag join with a BROADCAST of the target
    # ids was tried two ways in interleaved A/Bs and reverted — (a) without
    # the persist (two raw store scans, the dedup stores' persist=False
    # logic): 0.93x at sf0.1 / 1.06x at 6x-sf0.1; (b) with the persist
    # kept: 0.95x at sf0.1. The store join is already shuffle-free on the
    # corpus-sized side (bucketed by id) and the flags frame is thin, so
    # the broadcast only adds build cost at the bench operating point; the
    # ~6% 6x-scale win is too small to buy a bench-point loss. Revisit if
    # the store's id-bucket layout ever changes.
    if tb is None:
        tbf = _term_buckets(df, id_col, text_col, target_pred, m)
    else:
        flags = df.select(F.col(id_col).alias("id"), target_pred.alias("is_t"))
        tbf = tb.join(flags, "id")
    tb = tbf.persist(StorageLevel.MEMORY_AND_DISK)
    counts = tb.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cq"),
    )
    totals = counts.agg(
        F.sum("ct").cast("double").alias("tt"), F.sum("cq").cast("double").alias("qq")
    )
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log((F.col("ct") + 1) / (F.col("tt") + m))
            - F.log((F.col("cq") + 1) / (F.col("qq") + m)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    return (
        tb.filter(~F.col("is_t"))
        .join(F.broadcast(lr), "b")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("lr").alias("score_dec"))
    )


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str,
    m: int = 1024,
    top_n: int = 100,
    tb: DataFrame | None = None,
) -> DataFrame:
    """(rank, id, n_terms, score) — the ``top_n`` most-target-like pool
    docs. Rank breaks exact-decimal score ties by id, so the selection is
    total-ordered and reproducible. The orderBy+limit compiles to
    TakeOrderedAndProject — per-partition partial top-n, one driver merge
    of #partitions × top_n rows, NO global sort — and only then does the
    ranking window run, over at most ``top_n`` rows."""
    from pyspark.sql import Window

    scored = dsir_scores(df, target_pred, id_col, text_col, m=m, tb=tb)
    top = scored.orderBy(F.col("score_dec").desc(), F.col("id")).limit(top_n)
    win = Window.orderBy(F.col("score_dec").desc(), F.col("id"))
    return (
        top.withColumn("rank", F.row_number().over(win))
        .select(
            "rank",
            F.col("id"),
            "n_terms",
            F.round(F.col("score_dec"), 4).cast("double").alias("score"),
        )
    )


def dsir_resample(
    df: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str,
    m: int = 1024,
    top_n: int = 100,
    temperature: float = 1.0,
    salt: str = "dsir-v1:",
    tb: DataFrame | None = None,
) -> DataFrame:
    """(rank, id, n_terms, score, key) — Gumbel-top-k importance
    RESAMPLING, the paper's actual selection step (top-k by raw score
    over-concentrates on near-duplicates of the target; sampling
    ∝ exp(score/T) without replacement preserves diversity). The Gumbel
    max trick makes that sampling a deterministic top-k: perturbed key =
    score + T·g with g ~ Gumbel(0,1); argtop-k of the keys IS a sample
    without replacement from the softmax (equivalently argtop of
    score/T + g, scaled by T to keep the score term decimal-exact).

    g derives from the portable hash fraction (md5 of salt+id, +0.5/2²⁴
    so u ∈ (0,1) strictly — u=0 would send -ln(-ln(u)) to -inf), is
    rounded once to 6 dp and added as DECIMAL, so like the score the key
    is bit-identical across engines and partition orders: reshuffling a
    100-TB corpus cannot change the sample."""
    scored = dsir_scores(df, target_pred, id_col, text_col, m=m, tb=tb)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 6),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(HASH_DENOM)
    g = (
        F.round(F.lit(float(temperature)) * -F.log(-F.log(u)), 6)
        .cast("decimal(18,6)")
        .alias("g")
    )
    keyed = scored.withColumn("key_dec", F.col("score_dec") + g)
    top = keyed.orderBy(F.col("key_dec").desc(), F.col("id")).limit(top_n)
    from pyspark.sql import Window

    win = Window.orderBy(F.col("key_dec").desc(), F.col("id"))
    return (
        top.withColumn("rank", F.row_number().over(win))
        .select(
            "rank",
            F.col("id"),
            "n_terms",
            F.round(F.col("score_dec"), 4).cast("double").alias("score"),
            F.round(F.col("key_dec"), 4).cast("double").alias("key"),
        )
    )
