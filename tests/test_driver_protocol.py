"""The driver's correctness gate, replicated at its OWN operating point.

``test_oracle_parity.py`` runs sf0.001 with 9-sig-fig float slop — great for
fast iteration, but the driver runs **sf0.01**, from a **foreign cwd**, on a
session it built itself with **none of our build-time confs**, and compares
**exact sorted-frame value hashes** of ``toPandas()`` output. 125 of the 190
catalog queries had never been driver-sampled as of round 3, so this module
clones that exact protocol locally: a query cannot be green here and red on
first driver contact.

Deliberately mirrored driver behaviors:

- sf0.01 data (override with ``SPARK_GRAFT_PROTOCOL_SF``);
- a bare ``SparkSession.builder.master(local[N])`` with no package confs —
  the package's own ``configure()`` (invoked by ``sources.table``) must make
  the session deterministic, exactly as on driver contact;
- ``os.chdir`` to a temp dir for the session's lifetime (catches relative
  warehouse/store paths);
- value compare = EXACT canonical equality of the column-name-sorted,
  row-sorted pandas frames (no float slop: every catalog query rounds on
  both sides, so post-round values must be bit-identical);
- rows-only queries checked for run + stable schema + hashable cells (the
  driver's canonicalizer dies on unhashable cells).

Excluded from default runs via ``pytest.ini`` (``-m "not driver_protocol"``);
run with ``python -m pytest -m driver_protocol tests/test_driver_protocol.py``.

``SPARK_GRAFT_PROTOCOL_SF=/root/testdata/sf0.1`` runs the same gate at 10×
the driver's data — the deeper sweep that catches SCALE-dependent oracle
breaks (it falsified the HLL-rollup oracle's hardcoded union-equality
boolean, which only holds while sketches stay sparse). Green at sf0.001
(fast suite), sf0.01 (driver's operating point), and sf0.1.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import pytest

from fest_vibes_ai_etl_spark.plans import catalog

pytestmark = pytest.mark.driver_protocol

PROTOCOL_SF = os.environ.get("SPARK_GRAFT_PROTOCOL_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def proto_spark(tmp_path_factory):
    """Bare session, foreign cwd — the driver-contact shape."""
    from pyspark.sql import SparkSession

    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("foreign_cwd"))
    spark = (
        SparkSession.builder.appName("driver-protocol")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    try:
        yield spark
    finally:
        spark.stop()
        os.chdir(cwd)


@pytest.fixture(scope="module")
def proto_duck():
    import duckdb

    con = duckdb.connect()
    for t in catalog.TABLE_NAMES if hasattr(catalog, "TABLE_NAMES") else (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{PROTOCOL_SF}/{t}.parquet'")
    yield con
    con.close()


def _canon_cell(v):
    """Exact canonical repr — the no-slop twin of the driver's hash input."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "␀"  # null sentinel
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "nan" if math.isnan(f) else repr(f)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        # pandas has no date dtype: DuckDB's .df() bridges DATE columns to
        # midnight datetime64[ns] while Spark's toPandas() yields
        # datetime.date objects. Midnight-naive collapses to the date form —
        # the same collapse the driver's canonicalizer applies (these
        # columns hash-matched in rounds 1-3); a non-midnight time still
        # mismatches a date on the other side.
        if isinstance(v, pd.Timestamp):
            v = v.tz_localize(None) if v.tzinfo else v
        else:
            v = v.replace(tzinfo=None)
        if (
            v.hour == v.minute == v.second == 0
            and getattr(v, "microsecond", 0) == 0
            and getattr(v, "nanosecond", 0) == 0
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray, dict)):
        # The driver's canonicalizer cannot hash these — surface it as the
        # same hard failure the driver would report.
        raise TypeError(f"unhashable cell type {type(v).__name__}: {v!r:.80}")
    return str(v)


def _canon_frame(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(_canon_cell(c) for c in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return list(pdf.columns), rows


ALL_QUERIES = sorted(catalog.queries())  # queries() loads the plan modules


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_driver_protocol(proto_spark, proto_duck, name):
    spec = catalog.REGISTRY[name]
    spdf = spec.fn(proto_spark, PROTOCOL_SF).toPandas()
    s_cols, s_rows = _canon_frame(spdf)

    if spec.oracle is None:
        # Driver's rows-only check: runs, has columns, cells hashable.
        assert s_cols
        return

    ddf = proto_duck.execute(spec.oracle).df()
    # STRICT schema convention (round 14, after the r12 pareto column-order
    # nit): the DECLARED column order must match, not just the sorted
    # names — the driver's compare is order-insensitive, so this is the
    # only place a drifting projection order gets caught.
    assert list(spdf.columns) == list(ddf.columns), (
        f"{name}: declared column ORDER differs: spark={list(spdf.columns)} "
        f"oracle={list(ddf.columns)}"
    )
    d_cols, d_rows = _canon_frame(ddf)
    assert s_cols == d_cols, f"{name}: schema {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows {len(s_rows)} != {len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ]
        pytest.fail(
            f"{name}: {len(diffs)} differing sorted rows of {len(s_rows)}; "
            f"first: spark={diffs[0][1]} oracle={diffs[0][2]}"
        )
