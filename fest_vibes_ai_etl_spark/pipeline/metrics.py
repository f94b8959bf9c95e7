"""Free pipeline metrics via the Observation API.

A stage gate that calls ``df.count()`` pays a full extra evaluation of the
stage's plan; ``df.observe`` attaches aggregate metrics to the SAME action
that materializes the data (the write), so row counts and quality tallies
cost zero additional jobs. At 100 TB that is the difference between one
pass and two over every layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_row_observer(
    df: DataFrame, name: str, *extra: "F.Column"
) -> tuple[DataFrame, Observation]:
    """Attach an Observation carrying a row count (plus any extra aggregate
    columns) to ``df``. Metrics become available on the observation after
    the FIRST action that consumes the returned DataFrame — run the write,
    then read ``obs.get`` — no separate count() pass."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows"), *extra), obs
