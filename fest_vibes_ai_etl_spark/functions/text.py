"""Text column expressions: tokenization, shingles, quality, language-ID.

Used by the document-pipeline operators (dedup, text analysis — the
training-data-pipeline extensions). All pure column expressions; the
tokenizer is a whitespace split (deterministic, oracle-reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"
STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "is", "in", "that", "it")

# marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized markers (corpus is latin-script)
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string>; empty when < k tokens."""
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]))
    )
    return F.when(F.size(toks) >= k, sh).otherwise(F.array().cast("array<string>"))


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.lower(F.regexp_replace(F.trim(text), WS, " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of normalized text)."""
    return F.md5(normalize_text(text))


def lang_scores(toks: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
    return out


def lang_id(toks: Column) -> Column:
    """Argmax over marker-word counts with fixed precedence order
    (en > es > fr > de > zh on ties); 'und' when no marker hits."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties → apply last
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr
