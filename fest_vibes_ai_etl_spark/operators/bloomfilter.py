"""Bloom-filter semi-join: a user-level runtime filter.

Spark's own runtime filtering (InjectRuntimeFilter / DPP) only fires inside
one optimizer run on eligible shapes; this operator is the explicit form for
pipelines that stage work across jobs — build a compact bitmap from the
filtering side once, then cheaply pre-filter a huge probe side *before* it
reaches the shuffle of the real join. The payoff at 100 TB: rows that would
be dropped by the join never get shuffled (bloom probe is a map-side
operation), at the cost of shipping a bitmap measured in KB–MB.

Distributed build, no driver bottleneck until the final bitmap collect:
key → k seeded xxhash64 positions (JVM-side), positions → (word, bit) →
``bit_or`` aggregate per 64-bit word — the collected result is ``num_bits/64``
longs regardless of input size. The probe is one Arrow-batched pandas UDF
over the k precomputed hash columns (vectorized bitmap lookups); no hash
function is reimplemented in Python, so build and probe can never disagree.

Sizing: FP rate ≈ (1 - e^{-k·n/m})^k. The default 2^20 bits / 5 hashes holds
~100k keys at ~2% FP; scale ``num_bits`` with the build side (128 MB of
bitmap holds ~100M keys) — beyond that, prefer a plain shuffle semi join.

The reference has no analogue (single-node Postgres joins never pay a
shuffle); this is pure scale machinery for the Spark engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_BITS = 1 << 20
DEFAULT_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def build_bloom(
    build_side: DataFrame,
    key: str,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
):
    """Aggregate the build side into a bloom bitmap (numpy int64 array of
    ``num_bits/64`` words). Build cost: one explode + one distinct + one
    64-bit-word bit_or aggregate — all distributed; only the fixed-size
    bitmap is collected."""
    import numpy as np

    pos = (
        build_side.select(
            F.explode(F.array(*_positions(F.col(key), num_bits, num_hashes))).alias("p")
        )
        .distinct()
    )
    words = (
        pos.select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    bitmap = np.zeros(num_bits >> 6, dtype=np.int64)
    for r in words:
        bitmap[r.w] = r.word
    return bitmap


def bloom_might_contain(
    bitmap, key: Column, num_bits: int = DEFAULT_BITS, num_hashes: int = DEFAULT_HASHES
) -> Column:
    """Boolean probe column: true iff all k bits for ``key`` are set. Hashes
    are computed JVM-side (same xxhash64 as the build); the UDF only does
    vectorized bitmap lookups on the Arrow batch."""
    words = bitmap.tobytes()  # closure ships the raw words, not a numpy pickle
    n_words = len(bitmap)

    @pandas_udf("boolean")
    def _probe(hs: pd.Series) -> pd.Series:
        import numpy as np  # self-contained on executors

        bm = np.frombuffer(words, dtype=np.int64)
        assert len(bm) == n_words
        H = np.vstack(hs.to_numpy()).astype(np.int64)
        hit = (bm[H >> 6] >> (H & 63)) & 1
        return pd.Series(hit.all(axis=1))

    # nondeterministic ONLY to stop InferFiltersFromConstraints from copying
    # this probe onto the build side of the downstream semi join (the build
    # side already defines the bitmap — probing it is pure waste); the filter
    # itself stays exactly where it's placed, right above the probe scan.
    _probe = _probe.asNondeterministic()
    return _probe(F.array(*_positions(key, num_bits, num_hashes)))


def bloom_semi_join(
    probe_side: DataFrame,
    build_side: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``probe_side`` to ``build_side`` with a bloom pre-filter.
    With ``exact`` (default) a real semi join runs after the pre-filter to
    remove bloom false positives — the result is then EXACTLY the semi join,
    but only the ~FP-rate excess of matching rows ever reaches the shuffle.
    ``exact=False`` keeps the pure map-side filter (no shuffle at all) for
    consumers that tolerate the FP rate (e.g. pre-aggregation pruning)."""
    bitmap = build_bloom(build_side, build_key, num_bits, num_hashes)
    pre = probe_side.filter(
        bloom_might_contain(bitmap, F.col(probe_key), num_bits, num_hashes)
    )
    if not exact:
        return pre
    keys = build_side.select(F.col(build_key).alias(probe_key)).distinct()
    return pre.join(keys, probe_key, "left_semi")
