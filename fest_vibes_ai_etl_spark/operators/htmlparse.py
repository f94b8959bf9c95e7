"""Listing-HTML → event rows: the extractor's parse stage (P1-P5/U5).

Reference behavior (/root/reference/src/extractor/service.py:473-566 and the
fixture grammar in tests/simple_tests.py:300-462): a calendar page is a
``div.livewire-listing`` of venue panels; each panel has a title link
(venue name + href) and rows of ``div.calendar-info`` each holding the event
link (artist name + event href), a genres paragraph (comma-separated) and a
time paragraph.

Spark shape: one input row per fetched page → ``mapInPandas`` parse →
exploded event rows (the UDTF pattern: 1 page ⇒ N events). The parser is
stdlib ``html.parser`` (fixture-grade; a production deployment swaps in a
hardened parser inside the same closure — the distributed shape is
identical). Closure is self-contained so it runs on executors without this
package on their path.

Parsing stays per-page-parallel: pages were fetched into a DataFrame, so a
100 TB crawl parses as a pure map stage with zero shuffles until
normalization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from ..functions import scalar

PARSED_EVENT = StructType(
    [
        StructField("event_date", StringType()),
        StructField("venue_name", StringType()),
        StructField("wwoz_venue_href", StringType()),
        StructField("artist_name", StringType()),
        StructField("wwoz_event_href", StringType()),
        StructField("genres", ArrayType(StringType())),
        StructField("time_text", StringType()),
    ]
)


def parse_listing_html(df: DataFrame, html_col: str, date_col: str) -> DataFrame:
    """(…, html, date) rows → one row per event found in the listing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        from html.parser import HTMLParser

        class Listing(HTMLParser):
            """Walks the livewire-listing grammar with a tiny state machine."""

            def __init__(self):
                super().__init__()
                self.events: list[dict] = []
                self.stack: list[tuple[str, str]] = []  # (tag, classes)
                self.in_title = False
                self.in_info = False
                self.info_depth = 0
                self.venue = (None, None)
                self.cur: dict | None = None
                self.p_texts: list[str] = []
                self.text_target: list[str] | None = None

            def handle_starttag(self, tag, attrs):
                a = dict(attrs)
                cls = a.get("class", "")
                self.stack.append((tag, cls))
                if tag == "h3" and "panel-title" in cls:
                    self.in_title = True
                elif self.in_title and tag == "a":
                    self.venue = (None, a.get("href"))
                    self.text_target = []
                elif tag == "div" and "calendar-info" in cls:
                    self.in_info = True
                    self.info_depth = len(self.stack)
                    self.cur = {"href": None, "artist": None}
                    self.p_texts = []
                elif self.in_info and tag == "a" and self.cur is not None and self.cur["href"] is None:
                    self.cur["href"] = a.get("href")
                    self.text_target = []
                elif self.in_info and tag == "p":
                    self.text_target = []

            def handle_data(self, data):
                if self.text_target is not None:
                    self.text_target.append(data)

            def handle_endtag(self, tag):
                while self.stack and self.stack[-1][0] != tag:
                    self.stack.pop()
                top_cls = self.stack[-1][1] if self.stack else ""
                if self.stack:
                    self.stack.pop()
                text = "".join(self.text_target or []).strip()
                if tag == "a" and self.in_title:
                    self.venue = (text, self.venue[1])
                    self.in_title = False
                elif tag == "a" and self.in_info and self.cur is not None and self.cur["artist"] is None:
                    self.cur["artist"] = text
                elif tag == "p" and self.in_info:
                    self.p_texts.append(text)
                elif tag == "div" and self.in_info and len(self.stack) < self.info_depth:
                    genres = [g.strip() for g in (self.p_texts[0] if self.p_texts else "").split(",") if g.strip()]
                    self.events.append(
                        {
                            "venue_name": self.venue[0],
                            "wwoz_venue_href": self.venue[1],
                            "artist_name": (self.cur or {}).get("artist"),
                            "wwoz_event_href": (self.cur or {}).get("href"),
                            "genres": genres,
                            "time_text": self.p_texts[1] if len(self.p_texts) > 1 else "",
                        }
                    )
                    self.in_info = False
                    self.cur = None
                self.text_target = None

        cols = [f.name for f in PARSED_EVENT.fields]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                p = Listing()
                p.feed(getattr(r, html_col) or "")
                for ev in p.events:
                    out.append({"event_date": getattr(r, date_col), **ev})
            yield _pd.DataFrame(out, columns=cols) if out else _pd.DataFrame(columns=cols)

    return df.select(html_col, date_col).mapInPandas(run, schema=PARSED_EVENT)


def parsed_to_bronze(parsed: DataFrame) -> DataFrame:
    """Parsed rows → EventDTO-shaped bronze columns: performance_time from
    the time text (F1/F2 column exprs — JVM-side, not in the parser), struct
    assembly matching schemas.EVENT_DTO."""
    perf = scalar.performance_timestamp(F.col("event_date"), F.col("time_text"))
    return parsed.select(
        F.struct(
            F.col("artist_name").alias("name"),
            F.lit("lorum ipsum").alias("description"),
            F.col("genres"),
            F.array().cast("array<string>").alias("related_artists"),
            F.lit(None).cast("string").alias("wwoz_artist_href"),
            F.lit(None).cast("string").alias("website"),
        ).alias("artist_data"),
        F.struct(
            F.col("venue_name").alias("name"),
            F.lit(None).cast("string").alias("thoroughfare"),
            F.lit(None).cast("string").alias("phone_number"),
            F.lit("New Orleans").alias("locality"),
            F.lit(None).cast("string").alias("state"),
            F.lit(None).cast("string").alias("postal_code"),
            F.lit(None).cast("string").alias("full_address"),
            F.lit(True).alias("is_active"),
            F.lit(None).cast("string").alias("website"),
            F.col("wwoz_venue_href"),
            F.lit(None).cast("string").alias("event_artist"),
        ).alias("venue_data"),
        F.struct(
            F.col("event_date"),
            F.col("wwoz_event_href"),
            F.col("artist_name").alias("event_artist"),
            F.lit(None).cast("string").alias("wwoz_artist_href"),
            F.lit(None).cast("string").alias("description"),
            F.array().cast(
                "array<struct<name:string,wwoz_artist_href:string>>"
            ).alias("related_artists"),
            F.col("genres"),
        ).alias("event_data"),
        perf.alias("performance_time"),
        F.current_timestamp().alias("scrape_time"),
    )
