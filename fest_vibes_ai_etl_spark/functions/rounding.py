"""Cross-engine-stable rounding helpers.

Spark's ``round(double)`` rounds the shortest decimal representation
(HALF_UP on ``BigDecimal.valueOf``); DuckDB rounds the binary value. On
exact .xx5 boundaries — which averages and small-integer ratios hit
constantly (e.g. 40.55/2 = 20.275) — the two disagree by one ulp of the
target scale. Two stable patterns, applied identically on both sides:

- ``dec_sum``: sums of products accumulate in DECIMAL(18,6) (exact), are
  rounded as decimals, then cast back to double. Bit-identical everywhere.
- ``round_div``: quotient/ratio outputs get a +1e-6 (scale 2) / +1e-8
  (scale 4) nudge before rounding, moving the boundary off the rational
  grid the data lives on. The paired oracle SQL adds the same constant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS2, EPS4 = 1e-6, 1e-8


def round_div(col: Column, scale: int) -> Column:
    """Round a division/average result; stable across Spark and DuckDB."""
    eps = EPS2 if scale <= 2 else EPS4
    return F.round(col + eps, scale)


def dec_sum(col: Column, scale: int = 2) -> Column:
    """Exact decimal sum of a per-row double expression, rounded and
    returned as double (both engines produce the identical double)."""
    return F.round(F.sum(col.cast("decimal(18,6)")), scale).cast("double")
