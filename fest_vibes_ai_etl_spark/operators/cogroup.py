"""Cogrouped applyInPandas: per-key imperative merge of two DataFrames.

The union-tag-carry plan in ``operators/asof.py`` is the pure-DataFrame
as-of join; this module is the *cogroup* expression of the same family —
``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas(fn)`` hands each
key's rows from BOTH sides to one pandas function. That is the right shape
when the per-key logic is genuinely imperative (pandas ``merge_asof``,
custom matching loops, model scoring over aligned series) and the key
cardinality is high enough to parallelize.

Scale: one shuffle per side on the key (same cost as a join), then
embarrassingly parallel per-key Python work over Arrow batches. Skewed keys
bound the critical path — salt or pre-split hot keys before cogrouping.

SELF-COGROUP GOTCHA: if both sides derive from the SAME parent DataFrame
(e.g. two filters of one read), Spark's relation deduplication conflates the
right side's attributes with the left's and the right pandas frame arrives
with ONLY the grouping column(s) — silently, no analysis error. Build the
two sides from independent reads (fresh attribute ids) before cogrouping;
the per-group function also guards against column-less empty frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cogrouped_asof_match(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str = "event_id",
) -> DataFrame:
    """For every left row, attach the id+timestamp of the latest right row
    at-or-before it with the same key (backward as-of, left-join semantics).
    Returns left's columns plus (matched_id, matched_ts)."""
    left_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields)
    schema = f"{left_ddl}, matched_id long, matched_ts timestamp"
    lcols = [f.name for f in left.schema.fields]

    def fn(l, r):  # noqa: E741 - pandas cogroup signature
        import pandas as pd  # self-contained: runs on executors

        # A side with zero rows for this key can arrive as a frame with NO
        # columns at all — guard before any column access.
        if l.empty:
            return pd.DataFrame(columns=[*lcols, "matched_id", "matched_ts"])
        l = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            out = l.copy()
            out["matched_id"] = pd.Series(pd.NA, index=out.index, dtype="Int64")
            out["matched_ts"] = pd.Series(
                pd.NaT, index=out.index, dtype="datetime64[us]"
            )
        else:
            r = (
                r[[right_id, right_ts]]
                .rename(columns={right_id: "matched_id", right_ts: "matched_ts"})
                .sort_values("matched_ts", kind="mergesort")
            )
            out = pd.merge_asof(
                l, r, left_on=left_ts, right_on="matched_ts", direction="backward"
            )
        out["matched_id"] = out["matched_id"].astype("Int64")  # nullable long
        return out[[*lcols, "matched_id", "matched_ts"]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(fn, schema=schema)
    )
