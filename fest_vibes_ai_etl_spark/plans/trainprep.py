"""Training-set assembly queries — the steps between "clean corpus" and
"consumable training data": leakage-safe splits, eval-set decontamination,
token-budget packing, deterministic global shuffle, mixture resampling, and
Gopher-style repetition quality gates.

Beyond reference parity (the reference pipeline ends at load + cache,
`src/loader/service.py:1052-1132`); these are the BASELINE.json
training-data extensions. All oracle-checked: every decision derives from
portable hashes (md5 ↔ identical in DuckDB) or exact window arithmetic,
never RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.rounding import round_div
from ..operators import trainprep
from ..sources import table
from .catalog import register

HASH_FRAC_SQL = "('0x' || substr(md5({key}), 1, 6))::BIGINT / 16777216.0"

PACK_BUDGET = 2000
DECON_K = 4
MIX_TARGETS = {"en": 0.25, "es": 0.20, "fr": 0.20, "de": 0.20, "zh": 0.15}


@register(
    "corpus_split_assign",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN h < 0.8 THEN 'train'
                WHEN h < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, source,
                 {HASH_FRAC_SQL.format(key="'split-v1:' || source")} AS h
          FROM documents)
    """,
    tags=("trainprep", "split"),
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 80/10/10 train/val/test assignment keyed on ``source``:
    every doc from one source lands in the same split (no leakage across
    the boundary). Pure map-side — the split is a hash of the key, so it is
    stable under reruns, repartitioning, and growing data."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", trainprep.assign_split(F.col("source")).alias("split")
    )


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % 17 = 0 AS is_eval,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, is_eval,
             list_aggregate(w[i:i+{DECON_K - 1}], 'string_agg', ' ') AS g
      FROM toks, UNNEST(generate_series(1, len(w) - {DECON_K - 1})) AS t(i)
      WHERE len(w) >= {DECON_K}
    ),
    tr AS (SELECT DISTINCT doc_id, g FROM grams WHERE NOT is_eval),
    ev AS (SELECT DISTINCT doc_id AS eval_id, g FROM grams WHERE is_eval)
    SELECT tr.doc_id AS doc_id,
           COUNT(DISTINCT tr.g)       AS n_shared_shingles,
           COUNT(DISTINCT ev.eval_id) AS n_eval_matches
    FROM tr JOIN ev ON tr.g = ev.g
    GROUP BY tr.doc_id
    """,
    tags=("trainprep", "decontamination"),
    bench=True,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: train docs sharing any 4-word shingle with
    the eval slice (here: doc_id % 17), with overlap counts. The eval
    shingle set is broadcast (eval is a small fraction by construction);
    the train side stays map-side until the broadcast join."""
    docs = table(spark, sf_dir, "documents")
    return trainprep.decontaminate(
        docs, (F.col("doc_id") % 17 == 0), "doc_id", "text", k=DECON_K
    ).orderBy("doc_id")


@register(
    "corpus_pack_budget",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
      FROM documents
    ),
    binned AS (
      SELECT doc_id, lang, n_tok,
             CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {PACK_BUDGET}) AS INT) AS bin
      FROM sized
    )
    SELECT lang, bin,
           COUNT(*)                   AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
           MIN(doc_id)                AS first_doc,
           MAX(doc_id)                AS last_doc
    FROM binned GROUP BY lang, bin
    """,
    tags=("trainprep", "packing"),
)
def corpus_pack_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: contiguous 2000-token bins per language in
    deterministic doc_id order (a doc straddling a boundary belongs to the
    bin its first token falls in) — the sequence-packing step of training
    prep. One shuffle (the per-language running-sum window), then a partial
    agg."""
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "lang", F.size(T.tokens(F.col("text"))).alias("n_tok")
    )
    binned = trainprep.pack_budget(sized, "lang", "doc_id", "n_tok", PACK_BUDGET)
    return binned.groupBy("lang", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "corpus_shuffle_positions",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY md5('shuf-v1:' || CAST(doc_id AS VARCHAR))) - 1 AS pos
    FROM documents
    """,
    tags=("trainprep", "shuffle"),
)
def corpus_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: total order by a salted md5 of
    the id, materialized as a 0-based position. Implemented WITHOUT a
    single-partition window: range-partitioned sort + per-partition offsets
    (scalable zipWithIndex — see operators/trainprep.global_positions)."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuf-v1:"), F.col("doc_id").cast("string")))
    return trainprep.global_positions(docs, key).select("doc_id", "pos")


_MIX_VALUES = ", ".join(f"('{g}', {w})" for g, w in MIX_TARGETS.items())


@register(
    "corpus_mixture_resample",
    oracle=f"""
    WITH tgt(lang, w) AS (VALUES {_MIX_VALUES}),
    counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    joined AS (SELECT c.lang, c.n, CAST(t.w AS DOUBLE) AS w
               FROM counts c JOIN tgt t USING (lang)),
    cc AS (SELECT MIN(n / w) AS c FROM joined),
    rates AS (SELECT lang, n, (SELECT c FROM cc) * w / n AS rate FROM joined),
    kept AS (
      SELECT d.lang FROM documents d JOIN rates r USING (lang)
      WHERE {HASH_FRAC_SQL.format(key="'mix-v1:' || CAST(d.doc_id AS VARCHAR)")}
            < r.rate
    ),
    k AS (SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang),
    tot AS (SELECT CAST(SUM(n_kept) AS DOUBLE) AS t FROM k)
    SELECT r.lang, r.n AS n_before, k.n_kept,
           ROUND(CAST(k.n_kept AS DOUBLE) / (SELECT t FROM tot)
                 + 0.00000001, 4) AS share_kept
    FROM rates r JOIN k USING (lang)
    """,
    tags=("trainprep", "mixture"),
)
def corpus_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling: downsample-only rates
    rate_g = c·w_g/n_g (c = min n_g/w_g) hit the target language mix
    exactly at the largest achievable corpus size; the keep decision is a
    map-side hash compare against a broadcast rate table. Reports
    before/after counts and the achieved share."""
    docs = table(spark, sf_dir, "documents")
    rates = trainprep.mixture_rates(docs, "lang", MIX_TARGETS)
    kept = (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(trainprep.hash_fraction(F.col("doc_id"), "mix-v1:") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    tot = kept.agg(F.sum("n_kept").cast("double").alias("t"))
    return (
        rates.withColumnRenamed("n", "n_before")
        .select("lang", "n_before")
        .join(kept, "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_before",
            "n_kept",
            round_div(F.col("n_kept").cast("double") / F.col("t"), 4).alias(
                "share_kept"
            ),
        )
    )


@register(
    "text_repetition_quality",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS w,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_chars_ns
      FROM documents
    ),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS g
      FROM base, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    ),
    topbg AS (
      SELECT doc_id, MAX(c) AS top_c FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
      GROUP BY doc_id
    ),
    m AS (
      SELECT b.doc_id,
             len(w)                                        AS n_tok,
             ROUND(1 - len(list_distinct(w))
                   / CAST(len(w) AS DOUBLE) + 0.00000001, 4) AS dup_word_frac,
             ROUND(top_c / CAST(len(w) - 1 AS DOUBLE)
                   + 0.00000001, 4)                          AS top_bigram_frac,
             ROUND(n_chars_ns / CAST(len(w) AS DOUBLE)
                   + 0.000001, 2)                            AS mean_word_len
      FROM base b JOIN topbg USING (doc_id)
    )
    SELECT doc_id, n_tok, dup_word_frac, top_bigram_frac, mean_word_len,
           dup_word_frac <= 0.6 AND top_bigram_frac <= 0.05 AS keep
    FROM m
    """,
    tags=("trainprep", "quality", "gopher"),
    bench=True,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate, entirely map-side (zero
    shuffle): duplicate-word fraction, top-bigram repetition fraction and
    mean word length per doc, with a keep verdict. The bigram histogram is
    computed inside the row via array lambdas — no explode, no groupBy, so
    the filter scales linearly with corpus bytes."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        T.tokens(F.col("text")).alias("tk"),
        (F.length(F.regexp_replace(F.col("text"), r"\s+", ""))).alias("n_chars_ns"),
    )
    # bigrams in their own select so downstream refs are attribute reads,
    # not re-inlined lambda trees (the pushdown re-inline trap)
    with_bg = toks.select(
        "doc_id",
        "tk",
        "n_chars_ns",
        F.transform(
            F.sequence(F.lit(0), F.size("tk") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("tk", (i + 1).cast("int")),
                F.element_at("tk", (i + 2).cast("int")),
            ),
        ).alias("bg"),
    )
    top_c = F.array_max(
        F.transform(
            F.array_distinct("bg"),
            lambda b: F.size(F.filter("bg", lambda x: x == b)),
        )
    )
    m = with_bg.select(
        "doc_id",
        F.size("tk").alias("n_tok"),
        round_div(
            F.lit(1.0) - F.size(F.array_distinct("tk")) / F.size("tk"), 4
        ).alias("dup_word_frac"),
        round_div(top_c / (F.size("tk") - 1), 4).alias("top_bigram_frac"),
        round_div(F.col("n_chars_ns") / F.size("tk"), 2).alias("mean_word_len"),
    )
    return m.withColumn(
        "keep", (F.col("dup_word_frac") <= 0.6) & (F.col("top_bigram_frac") <= 0.05)
    )


TEMP_ALPHA = 0.7


@register(
    "corpus_mixture_temperature",
    oracle=f"""
    WITH counts AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n) AS t FROM counts),
    raw AS (
      SELECT lang, n, POWER(n / (SELECT t FROM tot), {TEMP_ALPHA} - 1.0) AS boost
      FROM counts
    ),
    rates AS (
      SELECT lang, n,
             ROUND(boost / (SELECT MAX(boost) FROM raw) + 0.00000001, 6) AS rate
      FROM raw
    ),
    kept AS (
      SELECT d.lang FROM documents d JOIN rates r USING (lang)
      WHERE {HASH_FRAC_SQL.format(key="'temp-v1:' || CAST(d.doc_id AS VARCHAR)")}
            < r.rate
    ),
    k AS (SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang),
    ktot AS (SELECT CAST(SUM(n_kept) AS DOUBLE) AS t FROM k)
    SELECT r.lang, CAST(r.n AS BIGINT) AS n_before, k.n_kept, r.rate,
           ROUND(CAST(k.n_kept AS DOUBLE) / (SELECT t FROM ktot) + 0.00000001, 4) AS share_kept
    FROM rates r JOIN k USING (lang) ORDER BY r.lang
    """,
    tags=("trainprep", "mixture", "temperature"),
    doc="Temperature-balanced language sampling (the mT5/XLM-R recipe): "
    "keep-rate_l ∝ p_l^(α-1) with α=0.7, normalized so the rarest "
    "language keeps everything — downsample-only, which a hash-threshold "
    "filter realizes exactly. Rates are ROUNDED to 6 decimals on both "
    "engines before the keep comparison so a 1-ulp pow() divergence "
    "cannot flip a row's membership. Rates broadcast; the keep decision "
    "is map-side — zero shuffle until the report aggregate.",
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    raw = counts.crossJoin(F.broadcast(tot)).select(
        "lang", "n", F.pow(F.col("n") / F.col("t"), TEMP_ALPHA - 1.0).alias("boost")
    )
    mx = raw.agg(F.max("boost").alias("mb"))
    rates = raw.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n",
        F.round(F.col("boost") / F.col("mb") + 1e-8, 6).alias("rate"),
    )
    kept = (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(
            trainprep.hash_fraction(F.col("doc_id"), "temp-v1:") < F.col("rate")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    ktot = kept.agg(F.sum("n_kept").cast("double").alias("t"))
    return (
        rates.join(kept, "lang")
        .crossJoin(F.broadcast(ktot))
        .select(
            "lang",
            F.col("n").cast("long").alias("n_before"),
            "n_kept",
            "rate",
            round_div(F.col("n_kept").cast("double") / F.col("t"), 4).alias(
                "share_kept"
            ),
        )
        .orderBy("lang")
    )


NEG_USERS = 20
NEG_K = 5


@register(
    "trainprep_negative_interactions",
    oracle=f"""
    WITH users AS (
      SELECT c_custkey FROM customer WHERE c_custkey < {NEG_USERS}
    ),
    seen AS (
      SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey < {NEG_USERS}
    ),
    cand AS (
      SELECT u.c_custkey, p.p_partkey,
             md5(CAST(u.c_custkey AS VARCHAR) || ':' || CAST(p.p_partkey AS VARCHAR)) AS h
      FROM users u CROSS JOIN part p
      LEFT JOIN seen s ON s.c_custkey = u.c_custkey AND s.l_partkey = p.p_partkey
      WHERE s.c_custkey IS NULL
    )
    SELECT c_custkey, p_partkey, CAST(rk AS INT) AS rk FROM (
      SELECT c_custkey, p_partkey,
             ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY h DESC, p_partkey) AS rk
      FROM cand
    ) WHERE rk <= {NEG_K} ORDER BY c_custkey, rk
    """,
    tags=("trainprep", "negatives", "recommender"),
    doc="Negative sampling for implicit-feedback training (BPR/ALS-style): "
    "per user, k items the user has NOT interacted with, drawn by md5 hash "
    "rank — deterministic across engines, retries, and partitionings (the "
    "RNG is the data). The user sample broadcasts, the anti-join removes "
    "positives, and ranking goes through the map-side top-k prune: only "
    "k·|users| rows reach the shuffle no matter the catalog size.",
)
def trainprep_negative_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from ..operators.topk import topk_per_group

    users = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < NEG_USERS)
        .select("c_custkey")
    )
    seen = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < NEG_USERS)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
        .join(
            table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("c_custkey", "l_partkey")
        .distinct()
    )
    parts = table(spark, sf_dir, "part").select("p_partkey")
    seen_k = seen.select(
        F.col("c_custkey").alias("s_cust"), F.col("l_partkey").alias("s_part")
    )
    cand = (
        parts.crossJoin(broadcast(users))
        .join(
            broadcast(seen_k),
            (F.col("c_custkey") == F.col("s_cust"))
            & (F.col("p_partkey") == F.col("s_part")),
            "left_anti",
        )
        .select(
            "c_custkey",
            "p_partkey",
            F.md5(
                F.concat_ws(
                    ":", F.col("c_custkey").cast("string"), F.col("p_partkey").cast("string")
                ).cast("binary")
            ).alias("h"),
        )
    )
    return (
        topk_per_group(cand, ["c_custkey"], "h", "p_partkey", NEG_K)
        .select("c_custkey", "p_partkey", "rk")
        .orderBy("c_custkey", "rk")
    )


DSIR_M = 1024
DSIR_TOP_N = 100


@register(
    "corpus_dsir_selection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en' AND source IN ('src0','src1')) AS is_t,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ),
    terms AS (
      SELECT doc_id, is_t, unnest(w) AS term FROM toks
      UNION ALL
      SELECT doc_id, is_t, w[i] || ' ' || w[i+1] AS term
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    tb AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % {DSIR_M} AS b
      FROM terms
    ),
    counts AS (
      SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cq
      FROM tb GROUP BY b
    ),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt,
                   CAST(SUM(cq) AS DOUBLE) AS qq FROM counts),
    lr AS (
      SELECT b, CAST(ROUND(ln((ct + 1) / (tt + {DSIR_M}))
                           - ln((cq + 1) / (qq + {DSIR_M})), 6)
                     AS DECIMAL(18,6)) AS lr
      FROM counts, tot
    ),
    sc AS (
      SELECT tb.doc_id, COUNT(*) AS n_terms, SUM(lr.lr) AS s
      FROM tb JOIN lr USING (b) WHERE NOT is_t GROUP BY tb.doc_id
    )
    SELECT ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank,
           doc_id, n_terms, CAST(ROUND(s, 4) AS DOUBLE) AS score
    FROM sc ORDER BY s DESC, doc_id LIMIT {DSIR_TOP_N}
    """,
    tags=("trainprep", "dsir", "sampling"),
    bench=True,
    prepare=lambda spark, sf_dir: trainprep.load_or_build_dsir_term_store(
        spark, table(spark, sf_dir, "documents"), sf_dir, m=DSIR_M
    ),
)
def corpus_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, NeurIPS): pick the pool docs
    whose hashed-{uni,bi}gram distribution best matches a small target
    slice (here: English docs from src0/src1), by summed per-term
    log p(bucket)/q(bucket) with Laplace smoothing over 1024 buckets.
    The log-ratio table is m rows and broadcast; per-bucket ratios are
    rounded once then decimal-summed, so scores (and hence the top-100
    ranking) are bit-identical across engines and partition orders; the
    top-n compiles to TakeOrderedAndProject, never a global sort. Term
    buckets come from the persisted DSIR store (target-independent: one
    build serves every target domain)."""
    docs = table(spark, sf_dir, "documents")
    tb = trainprep.load_or_build_dsir_term_store(spark, docs, sf_dir, m=DSIR_M)
    pred = (F.col("lang") == "en") & F.col("source").isin("src0", "src1")
    return trainprep.dsir_select(
        docs, pred, "doc_id", "text", m=DSIR_M, top_n=DSIR_TOP_N, tb=tb,
    ).withColumnRenamed("id", "doc_id").orderBy("rank")


@register(
    "corpus_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en' AND source IN ('src0','src1')) AS is_t,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ),
    terms AS (
      SELECT doc_id, is_t, unnest(w) AS term FROM toks
      UNION ALL
      SELECT doc_id, is_t, w[i] || ' ' || w[i+1] AS term
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    tb AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % {DSIR_M} AS b
      FROM terms
    ),
    counts AS (
      SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cq
      FROM tb GROUP BY b
    ),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt,
                   CAST(SUM(cq) AS DOUBLE) AS qq FROM counts),
    lr AS (
      SELECT b, CAST(ROUND(ln((ct + 1) / (tt + {DSIR_M}))
                           - ln((cq + 1) / (qq + {DSIR_M})), 6)
                     AS DECIMAL(18,6)) AS lr
      FROM counts, tot
    ),
    sc AS (
      SELECT tb.doc_id, COUNT(*) AS n_terms, SUM(lr.lr) AS s
      FROM tb JOIN lr USING (b) WHERE NOT is_t GROUP BY tb.doc_id
    ),
    keyed AS (
      SELECT doc_id, n_terms, s,
             s + CAST(ROUND(-ln(-ln(
                   ((('0x' || substr(md5('dsir-v1:' || CAST(doc_id AS VARCHAR)),
                       1, 6))::BIGINT + 0.5) / 16777216.0))), 6)
                   AS DECIMAL(18,6)) AS key_dec
      FROM sc
    )
    SELECT ROW_NUMBER() OVER (ORDER BY key_dec DESC, doc_id) AS rank,
           doc_id, n_terms, CAST(ROUND(s, 4) AS DOUBLE) AS score,
           CAST(ROUND(key_dec, 4) AS DOUBLE) AS key
    FROM keyed ORDER BY key_dec DESC, doc_id LIMIT {DSIR_TOP_N}
    """,
    tags=("trainprep", "dsir", "sampling"),
)
def corpus_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's actual selection step: Gumbel-top-k importance RESAMPLING
    (sample ∝ exp(score/T) without replacement — raw top-k
    over-concentrates on near-copies of the target; the Gumbel-max trick
    turns the sampling into a deterministic top-k on score + T·Gumbel
    keys). The noise derives from the portable md5 hash fraction and is
    rounded-once-then-decimal-added like the score, so the SAMPLE itself
    is bit-reproducible across engines, reruns and repartitioning —
    auditable sampling, which 100-TB corpus governance needs."""
    docs = table(spark, sf_dir, "documents")
    tb = trainprep.load_or_build_dsir_term_store(spark, docs, sf_dir, m=DSIR_M)
    pred = (F.col("lang") == "en") & F.col("source").isin("src0", "src1")
    return trainprep.dsir_resample(
        docs, pred, "doc_id", "text",
        m=DSIR_M, top_n=DSIR_TOP_N, temperature=1.0, tb=tb,
    ).withColumnRenamed("id", "doc_id").orderBy("rank")


@register(
    "corpus_mixture_by_tokens",
    oracle=f"""
    WITH tgt(lang, w) AS (VALUES {_MIX_VALUES}),
    tok AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS nt
      FROM documents
    ),
    counts AS (SELECT lang, CAST(SUM(nt) AS BIGINT) AS n FROM tok GROUP BY lang),
    joined AS (SELECT c.lang, c.n, CAST(t.w AS DOUBLE) AS w
               FROM counts c JOIN tgt t USING (lang)),
    cc AS (SELECT MIN(n / w) AS c FROM joined),
    rates AS (SELECT lang, n, (SELECT c FROM cc) * w / n AS rate FROM joined),
    kept AS (
      SELECT t.lang, t.nt FROM tok t JOIN rates r USING (lang)
      WHERE {HASH_FRAC_SQL.format(key="'mix-v1:' || CAST(t.doc_id AS VARCHAR)")}
            < r.rate
    ),
    k AS (SELECT lang, CAST(SUM(nt) AS BIGINT) AS tok_kept FROM kept GROUP BY lang),
    tot AS (SELECT CAST(SUM(tok_kept) AS DOUBLE) AS t FROM k)
    SELECT r.lang, r.n AS tok_before, k.tok_kept,
           ROUND(CAST(k.tok_kept AS DOUBLE) / (SELECT t FROM tot)
                 + 0.00000001, 4) AS share_kept
    FROM rates r JOIN k USING (lang)
    """,
    tags=("trainprep", "mixture", "tokens"),
)
def corpus_mixture_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-budget mixture resampling — the unit training mixtures are
    actually specified in (a doc-count mixture over-serves any language
    whose documents run long). rate_g = c·w_g/T_g over token sums; the
    keep decision stays the map-side per-doc hash compare, and because it
    is independent of document length the kept token mass converges on
    the target share. Reports per-language token budgets before/after and
    the achieved token share."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "nt", T.token_count(F.col("text"))
    )
    rates = trainprep.mixture_rates(docs, "lang", MIX_TARGETS, weight_col="nt")
    kept = (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(trainprep.hash_fraction(F.col("doc_id"), "mix-v1:") < F.col("rate"))
        .groupBy("lang")
        .agg(F.sum("nt").alias("tok_kept"))
    )
    tot = kept.agg(F.sum("tok_kept").cast("double").alias("t"))
    return (
        rates.select("lang", F.col("n").alias("tok_before"))
        .join(kept, "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "tok_before",
            "tok_kept",
            round_div(F.col("tok_kept") / F.col("t"), 4).alias("share_kept"),
        )
    )


@register(
    "corpus_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT source, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    per_term AS (SELECT source, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    stats AS (
      SELECT source,
             COUNT(*) AS n_types,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM per_term GROUP BY source
    ),
    nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT s.source, nd.n_docs, s.n_tokens, s.n_types, s.n_hapax,
           ROUND(CAST(s.n_types AS DOUBLE) / s.n_tokens + 0.00000001, 4) AS ttr,
           ROUND(CAST(s.n_hapax AS DOUBLE) / s.n_types + 0.00000001, 4) AS hapax_frac
    FROM stats s JOIN nd USING (source)
    """,
    tags=("trainprep", "corpus", "vocab"),
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics — the Heaps'/Zipf-shape corpus
    health check (synthetic or templated sources show up as anomalous
    type-token ratio and hapax fraction; real language sits near
    TTR^-Zipf expectations). One explode + one (source, term) aggregate
    with map-side partial counts — per-term rows cross the exchange once;
    the per-source rollup is |vocab|-sized."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("term"))
    per_term = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    stats = per_term.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    nd = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return stats.join(nd, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_types",
        "n_hapax",
        round_div(F.col("n_types") / F.col("n_tokens"), 4).alias("ttr"),
        round_div(F.col("n_hapax") / F.col("n_types"), 4).alias("hapax_frac"),
    )


@register(
    "corpus_decontaminate_spans",
    oracle="""
    WITH base AS (
      SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS txt
      FROM documents
    ),
    ok AS (SELECT * FROM base WHERE length(txt) >= 34),
    h AS (
      SELECT doc_id, i, ('0x' || substr(md5(substr(txt, i, 20)), 1, 12))::BIGINT AS h
      FROM ok, UNNEST(generate_series(1, length(txt) - 19)) AS t(i)
    ),
    wm AS (
      SELECT doc_id, i,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 14 FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM h
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE i <= n_grams - 14),
    ev AS (SELECT doc_id AS eval_id, fp FROM fps WHERE doc_id % 17 = 0),
    tr AS (SELECT doc_id, fp FROM fps WHERE doc_id % 17 <> 0)
    SELECT tr.doc_id AS doc_id,
           COUNT(DISTINCT tr.fp)      AS n_shared_fps,
           COUNT(DISTINCT ev.eval_id) AS n_eval_matches
    FROM tr JOIN ev USING (fp)
    GROUP BY tr.doc_id ORDER BY tr.doc_id
    """,
    tags=("trainprep", "decontamination", "winnow"),
)
def corpus_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-level test-set decontamination: train docs sharing any
    winnowed fingerprint (≈ any ≥34-char passage) with the eval slice
    (doc_id % 17). Complements the word-4-gram variant
    (corpus_decontaminate): char-level winnowing is robust to
    tokenization and whitespace differences, the contamination mode
    shingle overlap misses. The fingerprint scan comes from the persisted
    winnow store; the eval half is a small fraction by construction and
    broadcast into the join."""
    from ..operators import dedup as dedup_ops

    docs = table(spark, sf_dir, "documents")
    fps = dedup_ops.load_or_build_winnow_store(spark, docs, sf_dir, k=20, w=15)
    ev = fps.filter(F.col("id") % 17 == 0).select(
        F.col("id").alias("eval_id"), "fp"
    )
    tr = fps.filter(F.col("id") % 17 != 0).select(F.col("id").alias("doc_id"), "fp")
    return (
        tr.join(F.broadcast(ev), "fp")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("fp").alias("n_shared_fps"),
            F.countDistinct("eval_id").alias("n_eval_matches"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_dsir_bucket_diagnostics",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en' AND source IN ('src0','src1')) AS is_t,
             regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ),
    terms AS (
      SELECT doc_id, is_t, unnest(w) AS term FROM toks
      UNION ALL
      SELECT doc_id, is_t, w[i] || ' ' || w[i+1] AS term
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    tb AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % {DSIR_M} AS b
      FROM terms
    ),
    counts AS (
      SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cq
      FROM tb GROUP BY b
    ),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt,
                   CAST(SUM(cq) AS DOUBLE) AS qq FROM counts),
    lr AS (
      SELECT b, CAST(ct AS BIGINT) AS ct, CAST(cq AS BIGINT) AS cq,
             CAST(ROUND(ln((ct + 1) / (tt + {DSIR_M}))
                        - ln((cq + 1) / (qq + {DSIR_M})), 6) AS DOUBLE) AS lr
      FROM counts, tot
    )
    SELECT ROW_NUMBER() OVER (ORDER BY lr DESC, b) AS rank, b, ct, cq, lr
    FROM lr ORDER BY lr DESC, b LIMIT 25
    """,
    tags=("trainprep", "dsir", "diagnostics"),
)
def corpus_dsir_bucket_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR model itself, inspected: the 25 most target-discriminative
    hashed-n-gram buckets (highest smoothed log p/q) with their raw
    target/pool counts — how a corpus owner audits WHAT the importance
    sampler is selecting for before trusting a selection run. The whole
    table is m rows; the top-k is a TakeOrdered over it."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    pred = (F.col("lang") == "en") & F.col("source").isin("src0", "src1")
    tb = trainprep._term_buckets(docs, "doc_id", "text", pred, DSIR_M)
    counts = tb.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cq"),
    )
    totals = counts.agg(
        F.sum("ct").cast("double").alias("tt"), F.sum("cq").cast("double").alias("qq")
    )
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.col("ct").cast("long").alias("ct"),
        F.col("cq").cast("long").alias("cq"),
        F.round(
            F.log((F.col("ct") + 1) / (F.col("tt") + DSIR_M))
            - F.log((F.col("cq") + 1) / (F.col("qq") + DSIR_M)),
            6,
        ).alias("lr"),
    )
    top = lr.orderBy(F.col("lr").desc(), "b").limit(25)
    win = Window.orderBy(F.col("lr").desc(), "b")
    return top.withColumn("rank", F.row_number().over(win)).select(
        "rank", "b", "ct", "cq", "lr"
    )


PACK_CAP = 2000
PACK_SHARDS = 4


@register(
    "corpus_pack_capacity",
    oracle=f"""
    WITH RECURSIVE sized AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('pack-v1:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
               % {PACK_SHARDS} AS shard,
             len(regexp_split_to_array(trim(text), '\\s+')) AS nt
      FROM documents
    ),
    seq AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY lang, shard ORDER BY nt DESC, doc_id) AS rn
      FROM sized
    ),
    fold AS (
      SELECT lang, shard, rn, doc_id, nt, CAST(0 AS INT) AS bin, nt AS fill
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.lang, s.shard, s.rn, s.doc_id, s.nt,
             CASE WHEN f.fill + s.nt > {PACK_CAP} THEN f.bin + 1 ELSE f.bin END,
             CASE WHEN f.fill + s.nt > {PACK_CAP} THEN s.nt ELSE f.fill + s.nt END
      FROM fold f
      JOIN seq s ON s.lang = f.lang AND s.shard = f.shard AND s.rn = f.rn + 1
    )
    SELECT lang, CAST(shard AS INT) AS shard, bin,
           CAST(COUNT(*) AS BIGINT)  AS n_docs,
           CAST(SUM(nt) AS BIGINT)   AS bin_tokens,
           ROUND(SUM(nt) / {PACK_CAP}.0 + 0.00000001, 4) AS fill_frac,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM fold GROUP BY 1, 2, 3
    ORDER BY lang, shard, bin
    """,
    tags=("trainprep", "packing", "capacity"),
    doc="NO-STRADDLE sequence packing (next-fit-decreasing under a 2000-"
    "token capacity, per (lang, hash-shard)): the training-prep step for "
    "models that must not truncate documents — corpus_pack_budget's "
    "concat-and-chunk bins split a doc across boundaries; these never "
    "do. The bin index is a prefix-dependent fold (inexpressible with "
    "plain windows), run per bounded shard inside applyInPandas and "
    "oracled against a recursive-CTE transcription of the SAME fold — "
    "shard assignment, NFD order, and the fold are all deterministic "
    "(portable md5 shard, total (nt DESC, doc_id) order), so Spark and "
    "DuckDB must agree bin-for-bin. Reports per-bin doc counts, token "
    "mass, and fill fraction — the packing-waste audit.",
)
def corpus_pack_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack-v1:"), F.col("doc_id").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % PACK_SHARDS
    ).cast("int")
    sized = docs.select(
        "doc_id",
        "lang",
        shard.alias("shard"),
        F.size(T.tokens(F.col("text"))).cast("long").alias("nt"),
    )
    packed = trainprep.pack_capacity(
        sized, ["lang", "shard"], "doc_id", "nt", PACK_CAP
    )
    return (
        packed.groupBy("lang", "shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").alias("bin_tokens"),
            round_div(F.sum("nt") / float(PACK_CAP), 4).alias("fill_frac"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "shard", "bin")
    )
