"""Text analysis operators over the documents table.

Language-ID (marker-word heuristic), quality scoring, token counting, and
document fingerprinting — all pure column expressions (functions/text.py), so
they run inside whole-stage codegen with zero Python in the hot path. These
are the per-document map-side ops of a training-data pipeline: no shuffle at
all until an aggregation asks for one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.rounding import round_div


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len)."""
    toks = T.tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        round_div(F.length(F.col(text_col)) / F.size(toks), 4).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length/punct/stopword quality signals + a composite score in [0,1].
    Mirrors the heuristic-filter stage of LLM data pipelines: short docs,
    punctuation-free docs and stopword-free docs are down-scored."""
    text = F.col(text_col)
    toks = T.tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    sw = T.stopword_count(toks)
    punct = T.punct_count(text)
    stop_ratio = round_div(sw / n_tok, 4)
    punct_ratio = round_div(punct / n_chars, 4)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    score = round_div(0.5 * len_score + 0.5 * F.least(sw / F.lit(5.0), F.lit(1.0)), 4)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang) via marker-word argmax with fixed tie precedence."""
    toks = T.tokens(F.col(text_col))
    return df.select(F.col(id_col), T.lang_id(toks).alias("pred_lang"))


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — md5 over normalized text (exact-dedup key)."""
    return df.select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fingerprint"))


def bpe_ish_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Sub-word-ish token counting: splits on whitespace AND punctuation AND
    digit/letter boundaries (a cheap, deterministic proxy for BPE counts used
    to budget training tokens)."""
    pieces = F.split(
        F.trim(F.regexp_replace(F.col(text_col), r"([0-9]+|[^\w\s])", r" $1 ")), r"\s+"
    )
    return df.select(
        F.col(id_col),
        F.size(pieces).alias("n_pieces"),
    )
