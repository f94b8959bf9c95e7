"""Corpus-mining queries — the text-statistics layer of a training-data
pipeline over the documents table: corpus term/bigram frequencies, TF-IDF
keyword extraction, per-language vocabulary statistics, PII redaction.

All oracle-checked. The documents corpus is synthetic word-salad (no real
PII), so the redaction query injects deterministic synthetic PII from the
doc id — identically on both engines — and verifies the scrubber removes
exactly what it should.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.rounding import round_div
from ..operators import textanalysis
from ..sources import table
from .catalog import register


@register(
    "text_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ),
    bg AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS term
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    )
    SELECT term, COUNT(*) AS doc_freq
    FROM bg GROUP BY term
    ORDER BY doc_freq DESC, term LIMIT 25
    """,
    tags=("text", "corpus", "ngram"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-25 bigrams by document frequency (distinct-per-doc, so a
    bigram repeated within one doc counts once) — the n-gram census stage of
    corpus analysis. Map-side partial counts; only |vocab| rows shuffle."""
    docs = table(spark, sf_dir, "documents")
    return (
        textanalysis.term_document_frequencies(docs, "doc_id", "text", k=2)
        .orderBy(F.desc("doc_freq"), "term")
        .limit(25)
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents)
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id AS id, tf.term,
             ROUND(tf.tf * LN(n.n_docs / dfreq.df) + 0.00000001, 4) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT id, term, score, CAST(rk AS INT) AS rk FROM (
      SELECT id, term, score,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY score DESC, term) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
    tags=("text", "corpus", "tfidf"),
    bench=True,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords (idf = ln(N/df)). Ranking is on the
    rounded score with the term as tie-break — reproducible across engines,
    partitionings and cluster sizes."""
    docs = table(spark, sf_dir, "documents")
    return textanalysis.tfidf_top_terms(docs, "doc_id", "text", topk=3)


@register(
    "text_vocab_stats",
    oracle="""
    WITH tok AS (
      SELECT lang, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    per_term AS (SELECT lang, term, COUNT(*) AS n FROM tok GROUP BY lang, term)
    SELECT lang,
           CAST(SUM(n) AS BIGINT)              AS n_tokens,
           COUNT(*)                            AS vocab_size,
           COUNT(*) FILTER (WHERE n = 1)       AS hapax_count,
           ROUND(COUNT(*) / CAST(SUM(n) AS DOUBLE) + 0.00000001, 4) AS type_token_ratio
    FROM per_term GROUP BY lang
    """,
    tags=("text", "corpus", "vocab"),
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary statistics: token count, vocabulary size,
    hapax legomena (terms occurring once), type-token ratio. Two-level
    aggregation — per-(lang,term) counts then per-lang rollup — both with
    map-side partial aggregation."""
    docs = table(spark, sf_dir, "documents")
    per_term = (
        docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_term.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.count(F.when(F.col("n") == 1, 1)).alias("hapax_count"),
        round_div(F.count(F.lit(1)) / F.sum("n").cast("double"), 4).alias("type_token_ratio"),
    )


@register(
    "text_redact_pii",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@mail.example see https://ex.org/d/'
                  || doc_id || ' or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INT AS n_emails,
           len(regexp_extract_all(text, '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}'))::INT             AS n_phones,
           len(regexp_extract_all(text, 'https?://[^\\s]+'))::INT                               AS n_urls,
           CAST(LENGTH(regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 'https?://[^\\s]+', '<URL>', 'g'),
               '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}', '<PHONE>', 'g')) AS INT) AS redacted_len
    FROM seeded
    """,
    tags=("text", "pii", "redaction"),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: emails, URLs and phone numbers replaced by
    typed placeholders, with per-doc match counts. Synthetic PII is seeded
    from doc_id (the corpus itself is word-salad) identically on both
    engines; the comparison checks counts AND the redacted text length, so a
    scrubber that over- or under-matches fails the oracle."""
    docs = table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example see https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" or +1-555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("text"),
    )
    red = textanalysis.redact_pii(seeded, "doc_id", "text")
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_urls",
        F.length("redacted").alias("redacted_len"),
    )


@register(
    "corpus_chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE len(regexp_split_to_array(trim(text), '\\s+')) > 0
    ),
    chunked AS (
      SELECT doc_id, w,
             UNNEST(generate_series(0,
               CAST(floor((greatest(len(w) - 20, 0) + 9) / 10) AS INT))) AS chunk_id
      FROM toks
    )
    SELECT doc_id AS id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(w[chunk_id * 10 + 1 : chunk_id * 10 + 20], ' ') AS chunk_text,
           CAST(least(len(w) - (chunk_id * 10 + 1) + 1, 20) AS INT) AS n_tokens
    FROM chunked
    """,
    tags=("text", "corpus", "chunking"),
)
def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (20-token chunks every 10): the
    pre-training chunk generator as a declared 1⇒N map-side query."""
    docs = table(spark, sf_dir, "documents")
    return textanalysis.chunk_documents(docs, "doc_id", "text", size=20, stride=10)


@register(
    "text_charlm_scores",
    oracle="""
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', ' ', 'g') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, substr(t, i, 2) AS g
      FROM norm, UNNEST(generate_series(1, strlen(t) - 1)) AS u(i)
    ),
    freq AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g),
    tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v FROM freq
    ),
    scored AS (
      SELECT gr.doc_id,
             -log2((f.c + 1) / (tot.n + tot.v)) AS nll
      FROM grams gr JOIN freq f ON gr.g = f.g CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(nll) + 0.00000001, 4) AS avg_nll_bits
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "quality", "charlm"),
    doc="Character-bigram language-model scoring — the cheap perplexity "
    "proxy for corpus quality filtering: corpus-wide bigram frequencies "
    "with add-one smoothing give each document its average negative "
    "log2-likelihood per bigram (gibberish and boilerplate score high/low "
    "vs the corpus register). Two passes: one explode→count for the model "
    "(|V| rows shuffle — bounded by 27², never corpus-sized), one "
    "join-back scoring pass. A real LM filter swaps the frequency table "
    "for trained weights; the dataflow is identical.",
)
def text_charlm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z ]", " ").alias("t"),
    ).filter(F.length("t") >= 2)
    grams = norm.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("g"),
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(
        F.sum("c").cast("double").alias("n"), F.count(F.lit(1)).cast("double").alias("v")
    )
    from pyspark.sql.functions import broadcast

    nll = -F.log2((F.col("c") + 1) / (F.col("n") + F.col("v")))
    return (
        grams.join(broadcast(freq), "g")
        .crossJoin(broadcast(tot))
        .withColumn("nll", nll)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round_div(F.avg("nll"), 4).alias("avg_nll_bits"),
        )
        .orderBy("doc_id")
    )


VOCAB_PSI_BUCKETS = textanalysis.VOCAB_PSI_BUCKETS  # single source of truth


@register(
    "text_vocab_psi_drift",
    oracle=f"""
    WITH tok AS (
      SELECT lang, doc_id % 2 = 0 AS is_ref,
             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tb AS (
      SELECT lang, is_ref,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % {VOCAB_PSI_BUCKETS} AS b
      FROM tok
    ),
    cells AS (
      SELECT lang, b,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS tgt_n
      FROM tb GROUP BY lang, b
    ),
    tot AS (
      SELECT lang, SUM(ref_n) AS ref_tot, SUM(tgt_n) AS tgt_tot
      FROM cells GROUP BY lang
    ),
    terms AS (
      SELECT c.lang, t.ref_tot, t.tgt_tot,
             CAST(ROUND(
               ((c.ref_n + 0.5) / (t.ref_tot + {VOCAB_PSI_BUCKETS} * 0.5)
                - (c.tgt_n + 0.5) / (t.tgt_tot + {VOCAB_PSI_BUCKETS} * 0.5))
               * LN(((c.ref_n + 0.5) / (t.ref_tot + {VOCAB_PSI_BUCKETS} * 0.5))
                    / ((c.tgt_n + 0.5) / (t.tgt_tot + {VOCAB_PSI_BUCKETS} * 0.5))),
             8) AS DECIMAL(18,8)) AS term
      FROM cells c JOIN tot t USING (lang)
    )
    SELECT lang,
           CAST(MAX(ref_tot) AS BIGINT) AS n_ref_tokens,
           CAST(MAX(tgt_tot) AS BIGINT) AS n_tgt_tokens,
           CAST(ROUND(SUM(term), 6) AS DOUBLE) AS vocab_psi
    FROM terms GROUP BY lang ORDER BY lang
    """,
    tags=("text", "drift", "psi"),
)
def text_vocab_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two corpus slices (even vs odd doc ids) per
    language: PSI over hashed token buckets — the text-side analog of the
    numeric PSI monitor, catching vocabulary shift (new jargon, templating,
    crawl-source changes) without materializing the vocabulary itself.
    The bucket table is 128 cells per language regardless of corpus size;
    the fold is the shared ``psi_from_cells_exact`` (rounded-once decimal
    sum — the m-chances oracle-stability trick), the SAME fold the
    streaming vocabulary monitor uses, so the two reports are comparable
    digit-for-digit."""
    from ..operators import drift

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
        F.explode(T.tokens(F.col("text"))).alias("term"),
    )
    cells = (
        tok.select(
            "lang",
            "is_ref",
            textanalysis.term_bucket(F.col("term"), VOCAB_PSI_BUCKETS).alias("bin"),
        )
        .groupBy("lang", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("tgt_n"),
        )
    )
    out = drift.psi_from_cells_exact(cells, "lang", VOCAB_PSI_BUCKETS)
    return out.select(
        "lang",
        F.col("n_ref").alias("n_ref_tokens"),
        F.col("n_tgt").alias("n_tgt_tokens"),
        F.col("psi").alias("vocab_psi"),
    ).orderBy("lang")
