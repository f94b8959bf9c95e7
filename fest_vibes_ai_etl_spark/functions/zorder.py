"""Z-order (Morton) clustering keys: interleave the low bits of two
dimensions into one sort key so that sorting/range-partitioning on the key
co-locates rows that are close in BOTH dimensions.

Why it matters at 100 TB: parquet prunes row groups on per-column min/max.
A layout sorted on one column gives tight bounds for that column only; a
Morton-sorted layout gives *bounded rectangles* per file/row-group, so
selective predicates on either (or both) dimensions skip files. This is the
portable core of Delta's OPTIMIZE ZORDER BY, expressed as a pure column
expression (JVM-side, codegen-eligible — no UDF).

The reference's analogue is its two single-column indexes on
``events(artist_id, venue_id)`` and ``events(performance_time)``
(/root/reference/src/shared/db/database.py:167-172); a lakehouse gets the
multi-dimensional version through layout, not indexes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def morton_key(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integral columns
    (a in even positions, b in odd) into one long. Values are masked to
    ``bits`` first, so callers bucket/scale real domains (timestamps,
    doubles) into [0, 2^bits) beforehand."""
    mask = (1 << bits) - 1
    am, bm = a.bitwiseAND(F.lit(mask)), b.bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def morton_key_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """The identical interleave as ANSI SQL (for the DuckDB oracle) —
    generated from the same loop so the two can never drift."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({a} & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({b} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
