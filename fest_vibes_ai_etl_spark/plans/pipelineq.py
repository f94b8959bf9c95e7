"""Pipeline-semantics queries: merge/upsert engine + the EventDTO gold path.

The merge queries run on the driver tables so they get full DuckDB oracle
coverage; the EventDTO gold query runs on the deterministic bronze fixture
(rows-only check — its semantics are pinned down by tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import first_wins, merge_coalesce
from ..pipeline import gold, normalize
from ..pipeline.fixtures import bronze_fixture
from ..sources import table
from .catalog import register


def _merge_target(spark, sf_dir):
    """Simulated dim snapshot: every third segment NULLed, balances stale."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("segment"),
        F.round(F.col("c_acctbal"), 2).alias("bal"),
    )


def _merge_source(spark, sf_dir):
    """Fresh feed: odd keys are new rows; balances updated; segment present
    only for every fifth key (nulls must NOT clobber target values)."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_mktsegment")).alias("segment"),
        F.round(F.col("c_acctbal") + 100, 2).alias("bal"),
    )


@register(
    "merge_coalesce_upsert",
    oracle="""
    WITH t AS (
      SELECT c_custkey AS id, c_name AS name,
             CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS segment,
             ROUND(c_acctbal, 2) AS bal
      FROM customer WHERE c_custkey % 2 = 0
    ),
    s AS (
      SELECT c_custkey AS id, c_name AS name,
             CASE WHEN c_custkey % 5 = 0 THEN c_mktsegment END AS segment,
             ROUND(c_acctbal + 100, 2) AS bal
      FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT COALESCE(s.id, t.id)            AS id,
           ROUND(COALESCE(s.bal, t.bal), 2) AS bal,
           COALESCE(s.name, t.name)        AS name,
           COALESCE(s.segment, t.segment)  AS segment
    FROM t FULL OUTER JOIN s ON t.id = s.id
    """,
    tags=("merge", "upsert"),
)
def merge_coalesce_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upsert engine's core semantics (J2: new-if-not-null-else-keep,
    /root/reference/src/loader/service.py:348-351) as one full-outer merge."""
    t = _merge_target(spark, sf_dir)
    s = _merge_source(spark, sf_dir)
    return merge_coalesce(t, s, keys=["id"])


@register(
    "first_wins_latest_scrape",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    tags=("merge", "dedup"),
)
def first_wins_latest_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_wins operator (P12/W3 made deterministic): latest order per
    customer — the same pattern dedups scraped entities by latest scrape."""
    o = table(spark, sf_dir, "orders")
    return first_wins(
        o, keys=["o_custkey"], order_cols=[F.col("o_orderdate").desc(), F.col("o_orderkey")]
    ).select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )


@register(
    "pipeline_gold_event_documents",
    tags=("pipeline", "gold", "flagship"),
    doc="End-to-end EventDTO pipeline on the deterministic bronze fixture: "
    "validate → normalize to silver star schema → §3.4 gold query (4-way "
    "join + collect_lists + TTL) → cache payload. Rows-only check; exact "
    "semantics asserted in tests/test_pipeline.py.",
)
def pipeline_gold_event_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    bronze = bronze_fixture(spark)
    silver = normalize.normalize(bronze)
    g = gold.events_for_date(silver, "2025-03-01", ref_date="2025-03-01")
    return gold.to_cache_payload(g)


_LISTING_HTML = """
<div class="livewire-listing">
  <div class="panel panel-default">
    <h3 class="panel-title"><a href="/venues/123">Snug Harbor</a></h3>
    <div class="panel-body">
      <div class="row"><div class="calendar-info">
        <a href="/events/456">Ellis Marsalis Quartet</a><p>Jazz</p><p>8:00pm</p>
      </div></div>
      <div class="row"><div class="calendar-info">
        <a href="/events/789">Kermit Ruffins</a><p>Jazz, Blues</p><p>10:30pm</p>
      </div></div>
    </div>
  </div>
  <div class="panel panel-default">
    <h3 class="panel-title"><a href="/venues/456">Preservation Hall</a></h3>
    <div class="panel-body">
      <div class="row"><div class="calendar-info">
        <a href="/events/101">Preservation Hall Jazz Band</a><p>Traditional Jazz</p><p>8:00pm</p>
      </div></div>
    </div>
  </div>
</div>
"""


@register(
    "extractor_parse_listing",
    tags=("extractor", "parse", "udtf"),
    doc="P1-P5/U5: listing-HTML page rows → parsed event rows via "
    "mapInPandas (1 page ⇒ N events), time text extracted F1-style. "
    "Rows-only (HTML parsing has no SQL oracle); semantics pinned in "
    "tests/test_htmlparse.py against the reference's own parse fixture.",
)
def extractor_parse_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.htmlparse import parse_listing_html

    pages = spark.createDataFrame([(_LISTING_HTML, "2025-03-01")], "html string, d string")
    parsed = parse_listing_html(pages, "html", "d")
    # The driver's rows-only canonicalizer sorts a pandas frame, which dies on
    # raw array cells (unhashable list) — serialize the array column to JSON
    # in the *catalog projection only*; the operator keeps its typed schema.
    return parsed.withColumn("genres", F.to_json("genres")).orderBy("wwoz_event_href")
