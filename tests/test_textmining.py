"""Unit tests for the corpus-mining operators: PII redaction on real-looking
fixtures (the catalog query uses synthetic seeded PII), TF-IDF determinism,
and term-frequency semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import textanalysis


def test_redact_pii_fixture(spark):
    rows = [
        (1, "mail me at alice.smith+spam@example.co.uk or bob@x.io today"),
        (2, "see https://docs.example.com/a?b=1 and http://plain.org now"),
        (3, "call +1-555-0199 or +44-202-7946 tomorrow"),
        (4, "no pii here at all"),
        (5, "mixed: c@d.org https://e.fr/x +1-555-123 end"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in textanalysis.redact_pii(df, "id", "text").collect()}

    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0 and out[1]["n_urls"] == 0
    assert out[1]["redacted"] == "mail me at <EMAIL> or <EMAIL> today"
    assert out[2]["n_urls"] == 2 and "<URL>" in out[2]["redacted"]
    assert "docs.example.com" not in out[2]["redacted"]
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted"] == "call <PHONE> or <PHONE> tomorrow"
    assert out[4]["n_emails"] == out[4]["n_phones"] == out[4]["n_urls"] == 0
    assert out[4]["redacted"] == "no pii here at all"
    assert (out[5]["n_emails"], out[5]["n_urls"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["redacted"] == "mixed: <EMAIL> <URL> <PHONE> end"


def test_tfidf_rare_term_outranks_common(spark):
    # 'rare' appears in 1 of 4 docs; 'common' in all 4 (idf = ln(1) = 0).
    rows = [
        (1, "common rare common"),
        (2, "common common"),
        (3, "common"),
        (4, "common common common"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    top = textanalysis.tfidf_top_terms(df, "id", "text", topk=1).collect()
    best = {r["id"]: r["term"] for r in top}
    assert best[1] == "rare"
    # docs without a positive-idf term still emit their best (score 0) term
    assert best[2] == "common" and top[0]["rk"] == 1


def test_term_document_frequencies_distinct_per_doc(spark):
    df = spark.createDataFrame([(1, "a b a b"), (2, "a c")], ["id", "text"])
    uni = {
        r["term"]: r["doc_freq"]
        for r in textanalysis.term_document_frequencies(df, "id", "text", k=1).collect()
    }
    assert uni == {"a": 2, "b": 1, "c": 1}  # repeats within a doc count once
    bi = {
        r["term"]: r["doc_freq"]
        for r in textanalysis.term_document_frequencies(df, "id", "text", k=2).collect()
    }
    assert bi == {"a b": 1, "b a": 1, "a c": 1}


def test_chunking_covers_and_reconstructs(spark):
    rows = [
        (1, "a b c d e f g h i j k"),   # 11 tokens
        (2, "x"),                        # single token → one chunk
        (3, " ".join(f"t{i}" for i in range(45))),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = textanalysis.chunk_documents(df, "id", "text", size=4, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for did, text in [(1, rows[0][1]), (2, rows[1][1]), (3, rows[2][1])]:
        toks = text.split()
        chunks = sorted(by_doc[did], key=lambda r: r["chunk_id"])
        # chunk_ids dense from 0; every token covered; boundaries exact
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            start = c["chunk_id"] * 2
            expect = toks[start:start + 4]
            assert c["chunk_text"].split() == expect
            assert c["n_tokens"] == len(expect)
            covered.update(range(start, start + len(expect)))
        assert covered == set(range(len(toks)))
    # stride == size → non-overlapping reconstruction
    flat = textanalysis.chunk_documents(df, "id", "text", size=5, stride=5).collect()
    doc3 = sorted((r for r in flat if r["id"] == 3), key=lambda r: r["chunk_id"])
    assert " ".join(r["chunk_text"] for r in doc3) == rows[2][1]


def test_langid_model_seam_stub_classifier(spark):
    """The classifier path of language_id: mapInPandas plumbing verified
    with a deterministic stand-in (fasttext isn't in this container — the
    factory returns None here, pinned below). Schema and null-degrade
    contract match the heuristic path exactly."""
    import pandas as pd

    from fest_vibes_ai_etl_spark.operators import textanalysis

    docs = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "el gato de la casa"), (3, None), (4, "  ")],
        "doc_id long, text string",
    )

    def stub(texts: pd.Series) -> pd.Series:
        out = pd.Series(["und"] * len(texts), index=texts.index, dtype=object)
        mask = texts.notna() & texts.astype(str).str.strip().ne("")
        out[mask] = texts[mask].astype(str).str.contains("el ").map(
            {True: "es", False: "en"}
        )
        return out

    got = {
        r.doc_id: r.pred_lang
        for r in textanalysis.language_id(docs, "doc_id", "text", classifier=stub).collect()
    }
    assert got == {1: "en", 2: "es", 3: "und", 4: "und"}
    heur = textanalysis.language_id(docs, "doc_id", "text")
    assert heur.columns == ["doc_id", "pred_lang"]  # same surface both ways


def test_langid_factory_guard_import():
    from fest_vibes_ai_etl_spark.operators.textanalysis import real_langid_factory

    try:
        import fasttext  # noqa: F401

        assert real_langid_factory() is not None
    except ImportError:
        assert real_langid_factory() is None
