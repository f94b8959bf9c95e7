"""Roundtrip tests for the explicit-schema JSON/CSV interchange readers."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.sources import formats, table


@pytest.fixture()
def tmpdir():
    root = Path(tempfile.mkdtemp(prefix="fest_formats_"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_jsonl_roundtrip_documents(spark, tmpdir):
    docs = table(spark, SF_DIR, "documents")
    formats.write_jsonl(docs, str(tmpdir / "docs_json"), coalesce=2)
    back = formats.read_jsonl(
        spark,
        str(tmpdir / "docs_json"),
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    assert back.count() == docs.count()
    a = docs.agg(F.sum("n_chars"), F.count(F.lit(1))).collect()[0]
    b = back.agg(F.sum("n_chars"), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)
    assert back.schema["doc_id"].dataType.simpleString() == "bigint"


def test_csv_roundtrip_and_corrupt_quarantine(spark, tmpdir):
    nation = table(spark, SF_DIR, "nation")
    formats.write_csv(nation, str(tmpdir / "nation_csv"), coalesce=1)
    back = formats.read_csv(
        spark,
        str(tmpdir / "nation_csv"),
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
    )
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )

    # malformed JSON lines are quarantined per-row, not fatal
    bad = tmpdir / "bad.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all}\n')
    got = formats.read_jsonl(
        spark, str(bad), "doc_id BIGINT, text STRING, _corrupt_record STRING"
    )
    rows = got.collect()
    assert len(rows) == 2
    good = [r for r in rows if r._corrupt_record is None]
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 1 and good[0].doc_id == 1
    assert len(corrupt) == 1
