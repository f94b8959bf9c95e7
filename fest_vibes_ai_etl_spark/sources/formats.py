"""Explicit-schema batch readers/writers for the non-parquet interchange
formats the pipeline touches: JSON lines (the reference's S3 bronze format,
S4/S5) and CSV (operator-facing exports). Schema is ALWAYS supplied — schema
inference is a full extra pass over the data at 100 TB and is
non-deterministic under sampling, so it is banned here the same way the
reference hydrates DTOs from explicit dataclasses
(/root/reference/src/shared/dto/event_dto.py).

Readers accept either a StructType or a DDL string. Writers default to a
single compact layout knob (`coalesce`) because interchange files are small
exports; big data stays in partitioned parquet (sources/lakehouse.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    timestamp_format: str | None = None,
) -> DataFrame:
    """JSON-lines with an explicit schema. Corrupt records are captured, not
    fatal: PERMISSIVE + `_corrupt_record` keeps the bad-row quarantine
    pattern (P8) available to callers instead of failing the whole read."""
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with an explicit schema (never inferSchema: one pass, stable types)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, coalesce: int | None = None) -> None:
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """ORC columnar read. Schema optional — ORC carries its own types (no
    inference pass), but passing one pins the contract and enables pruning
    of never-read columns at scan time."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC columnar write (predicate pushdown + column pruning work the same
    as parquet; useful when downstream consumers are Hive/Trino-side)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text_docs(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Raw-text corpus ingest: one row per line (or per file with
    ``whole_file`` — each document is one file, the common crawl-dump
    layout). Columns: ``text`` plus ``source_file`` from the scan metadata,
    so downstream dedup/split operators can key on provenance."""
    from pyspark.sql import functions as F

    # NB: must be the reader kwarg — .option("wholetext", ...) is silently
    # ignored by the text source in Spark 4
    df = spark.read.text(path, wholetext=whole_file)
    return df.select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source_file"),
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal ingest: opaque media blobs via Spark's binaryFile source
    (columns path/modificationTime/length/content). The decode stage stays
    a mapInPandas over `operators/multimodal.py`; this is the scan. Large
    files are one row each — partition count follows file count, so callers
    repartition by bytes before heavy decode stages."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_archive_docs(
    spark: SparkSession, path: str, glob: str | None = None, encoding: str = "utf-8"
) -> DataFrame:
    """Compressed-corpus ingest: ZIP and GZIP archives → one row per
    archived text document — the Common-Crawl-dump shape (training corpora
    ship as millions of compressed containers, not loose text files).

    binaryFile scan → Arrow-batched decompression (stdlib ``zipfile``/
    ``gzip``, no codec deps): each .zip member becomes a row, each .gz
    yields one row; anything else (or a corrupt archive) yields a row with
    null ``text`` and the error class in ``error`` — the quarantine-not-
    crash convention, so one truncated archive in a million-file sweep
    costs one null row, not the job. Columns:
    (archive, member, n_bytes, text, error).

    Scale: decompression parallelism follows the file-partition layout of
    the binaryFile scan (one archive is one row — set maxPartitionBytes so
    a partition of archives fits executor memory); members of one archive
    stay in one task, which is the right locality since ZIP central
    directories must be read whole."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("archive", StringType()),
            StructField("member", StringType()),
            StructField("n_bytes", LongType()),
            StructField("text", StringType()),
            StructField("error", StringType()),
        ]
    )

    def run(batches):
        import gzip as _gzip
        import io as _io
        import zipfile as _zipfile

        import pandas as _pd

        cols = ["archive", "member", "n_bytes", "text", "error"]

        def rows_for(path_, content):
            blob = bytes(content)
            try:
                if blob[:4] == b"PK\x03\x04":
                    with _zipfile.ZipFile(_io.BytesIO(blob)) as zf:
                        for info in zf.infolist():
                            if info.is_dir():
                                continue
                            data = zf.read(info)
                            yield (path_, info.filename, len(data),
                                   data.decode(encoding, errors="replace"), None)
                elif blob[:2] == b"\x1f\x8b":
                    data = _gzip.decompress(blob)
                    yield (path_, None, len(data),
                           data.decode(encoding, errors="replace"), None)
                else:
                    yield (path_, None, len(blob), None, "UNKNOWN_FORMAT")
            except Exception as exc:
                yield (path_, None, len(blob), None, type(exc).__name__)

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                out.extend(rows_for(r.path, r.content))
            yield _pd.DataFrame(out, columns=cols)

    scan = read_binary_files(spark, path, glob=glob).select("path", "content")
    return scan.mapInPandas(run, schema=out_schema)


def split_warc_records(
    df: DataFrame, text_col: str = "text", source_col: str = "archive"
) -> DataFrame:
    """Split concatenated WARC/WET content (the Common Crawl text-extract
    format: ``WARC/1.0`` header blocks, blank line, payload) into one row
    per record: (source, record_type, target_uri, content, n_chars).

    Composes with :func:`read_archive_docs` — a ``.wet.gz`` dump becomes
    per-page rows in two stages, both Arrow-batched, no external WARC
    library. Header parsing is line-oriented and tolerant: records missing
    a header field carry null for it; ``warcinfo``/metadata records pass
    through with their type so callers filter to ``conversion`` (WET text)
    records explicitly rather than silently losing provenance."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("source", StringType()),
            StructField("record_type", StringType()),
            StructField("target_uri", StringType()),
            StructField("content", StringType()),
            StructField("n_chars", IntegerType()),
        ]
    )

    from pyspark.sql import functions as F

    def run(batches):
        import pandas as _pd

        cols = ["source", "record_type", "target_uri", "content", "n_chars"]

        def records(src, blob):
            if not blob:
                return
            for chunk in blob.split("WARC/1.0\r\n")[1:] or blob.split("WARC/1.0\n")[1:]:
                head, _sep, body = (
                    chunk.partition("\r\n\r\n")
                    if "\r\n\r\n" in chunk
                    else chunk.partition("\n\n")
                )
                rtype = uri = None
                for line in head.splitlines():
                    if line.startswith("WARC-Type:"):
                        rtype = line.split(":", 1)[1].strip()
                    elif line.startswith("WARC-Target-URI:"):
                        uri = line.split(":", 1)[1].strip()
                body = body.rstrip("\r\n")
                yield (src, rtype, uri, body, len(body))

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                out.extend(records(getattr(r, source_col), getattr(r, text_col)))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(
        F.col(source_col), F.col(text_col)
    ).mapInPandas(run, schema=out_schema)
