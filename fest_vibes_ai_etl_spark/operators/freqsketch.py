"""Frequency sketch: Misra-Gries heavy hitters, the third classic sketch
family next to HLL (distinct) and KLL (quantiles) in plans/sketches.py.

Per input partition a k-counter Misra-Gries summary is built in one pass
INSIDE the scan (mapInPandas — the tokenizing and counting never leave the
executor), then the shuffle carries ≤ k rows per partition. Summaries merge
by summing per-item counts; the undercount of any item is bounded by the
sum of per-partition decrement rounds D, so:

    est(item) ≤ true(item) ≤ est(item) + D

and every item with true count > D is guaranteed to surface (it cannot have
been decremented to zero everywhere). With k larger than the live vocabulary
no decrement ever fires, D = 0, and the sketch degrades gracefully to exact
counts — both regimes are pinned in tests/test_sketches.py.

At 100 TB this is the frequency query you can actually run: the fact table
is scanned once, nothing but k·#partitions summary rows move, and summaries
are re-mergeable to coarser groupings without rescanning (same property the
HLL rollup exploits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_mg_summaries(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over lowercase ``[a-z0-9']+``
    tokens of ``text_col``: rows ``(pid, item, cnt, dec)`` where ``dec`` is
    the partition's decrement-round count (one row with item NULL keeps
    empty partitions' dec visible)."""

    def gen(it):
        # Self-contained closure: executors may not have the repo on
        # sys.path, so only stdlib + pandas inside.
        import re

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pat = re.compile(r"[a-z0-9']+")
        counters: dict[str, int] = {}
        dec = 0
        for pdf in it:
            for txt in pdf[text_col]:
                if txt is None:
                    continue
                for tok in pat.findall(txt.lower()):
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:
                        dec += 1
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        rows = [(pid, t, c, dec) for t, c in counters.items()]
        if not rows:
            rows = [(pid, None, 0, dec)]
        yield pd.DataFrame(rows, columns=["pid", "item", "cnt", "dec"])

    return df.select(text_col).mapInPandas(
        gen, "pid int, item string, cnt long, dec long"
    )


def heavy_hitter_candidates(summaries: DataFrame) -> DataFrame:
    """Merge per-partition summaries: ``(item, est_count, max_undercount)``
    for every surviving candidate. est ≤ true ≤ est + max_undercount."""
    total_dec = (
        summaries.groupBy("pid")
        .agg(F.first("dec").alias("d"))
        .agg(F.sum("d").alias("max_undercount"))
    )
    ests = (
        summaries.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est_count"))
    )
    return ests.crossJoin(F.broadcast(total_dec))


def heavy_hitter_tokens(
    df: DataFrame, text_col: str, k: int, topn: int
) -> DataFrame:
    """Top-``topn`` candidates by estimated count (ties broken by item)."""
    return (
        heavy_hitter_candidates(token_mg_summaries(df, text_col, k))
        .orderBy(F.desc("est_count"), "item")
        .limit(topn)
    )
