"""Entity-resolution & ordered-analytics suite: blocked fuzzy matching,
pareto frontier (skyline), Markov transition matrices, statistical
outliers, and gaps-and-islands.

The reference resolves entities by exact natural key (artist ``name``,
venue ``(name, full_address)`` — /root/reference/src/shared/db/database.py:151-177)
and its crawl dedups hrefs with an in-run set
(/root/reference/src/extractor/service.py:29,199-204). The natural
warehouse-scale generalization is *fuzzy* resolution: block candidates on
a cheap key, score survivors with an edit metric. The remaining queries
are the ordered-analytics family a cache-backed events service
(SURVEY §3.4 read path) feeds: what users do next (transitions), what's
anomalous (outliers), and how activity clusters in time (islands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us

from ..functions.rounding import round_div
from ..operators.skyline import pareto_frontier_2d
from ..sources import table
from .catalog import register


@register(
    "er_blocked_fuzzy_pairs",
    oracle="""
    SELECT a.p_brand,
           COUNT(*) AS n_fuzzy_pairs,
           CAST(SUM(CASE WHEN levenshtein(a.p_name, b.p_name) = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    GROUP BY a.p_brand
    """,
    tags=("er", "fuzzy", "join"),
)
def er_blocked_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching: candidate pairs share a blocking key
    (brand), survivors have edit distance ≤ 3. Blocking is what makes
    fuzzy ER feasible at scale — the self-join shuffles on the block key
    only, so candidate generation is Σ|block|² instead of n²; skewed
    blocks would get AQE skew-split. Generalizes the reference's
    exact-name upsert identity (src/loader/service.py:324-422) to
    near-match resolution."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(
        F.col("p_brand"),
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
    )
    b = p.select(
        F.col("p_brand"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
    )
    lev = F.levenshtein("a_name", "b_name")
    return (
        a.join(b, "p_brand")
        .where(F.col("a_key") < F.col("b_key"))
        .where(lev <= 3)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_fuzzy_pairs"),
            F.sum(F.when(lev == 0, 1).otherwise(0)).alias("n_exact_pairs"),
        )
    )


@register(
    "pareto_frontier_parts",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("skyline", "window"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts where no other part is both cheaper-or-equal
    and bigger-or-equal (strictly better somewhere) — minimize
    p_retailprice, maximize p_size. The oracle is the quadratic
    NOT EXISTS; the Spark plan is the linear sweep in
    operators/skyline.py (two hash aggs + a prefix max, no crossJoin),
    which survives a 100× scale-up where the nested loop cannot."""
    parts = table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    # the skyline join emits its join key first — re-select the declared
    # order so the frame matches the oracle column-for-column under a
    # strict ordered-schema compare, not just the driver's order-
    # insensitive one
    return pareto_frontier_2d(
        parts, minimize="p_retailprice", maximize="p_size"
    ).select("p_partkey", "p_retailprice", "p_size")


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type, COUNT(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY prev_type)
                 + 0.00000001, 4) AS row_share
    FROM t
    """,
    tags=("behavior", "window", "markov"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    count of (previous type → type) steps plus the row-normalized
    transition probability. One user-keyed window (lag) + one 25-row
    aggregate; the normalizing window runs on the 25-row result, not the
    fact table. Deterministic ordering: (epoch micros, event_id) on both
    engines — the two-key tiebreak behavior.py uses for the NANOS
    timestamps."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", epoch_us("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    t = seq.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n_transitions")
    )
    w_row = Window.partitionBy("prev_type")
    return t.withColumn(
        "row_share",
        round_div(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_row),
            4,
        ),
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma,
             COUNT(*) AS n_total
      FROM events GROUP BY event_type
    ),
    o AS (
      SELECT e.event_type, COUNT(*) AS n_outliers
      FROM events e JOIN s ON e.event_type = s.event_type
      WHERE ABS(e.value - s.mu) > 2 * s.sigma
      GROUP BY e.event_type
    )
    SELECT s.event_type, s.n_total, o.n_outliers,
           ROUND(CAST(o.n_outliers AS DOUBLE) / s.n_total
                 + 0.00000001, 4) AS outlier_share
    FROM s JOIN o ON s.event_type = o.event_type
    """,
    tags=("stats", "quality"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier census (|value − μ| > 2σ): the sigma-rule
    anomaly gate a monitoring job runs over the fact table. Two passes —
    a tiny stats aggregate broadcast back onto the scan (no fact-table
    shuffle for the join), then a 5-row count. At 100 TB both scans
    stream; nothing is held per-group."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count("*").alias("n_total"),
    )
    outliers = (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_outliers"))
    )
    return (
        stats.select("event_type", "n_total")
        .join(outliers, "event_type")
        .withColumn(
            "outlier_share",
            round_div(F.col("n_outliers").cast("double") / F.col("n_total"), 4),
        )
    )


@register(
    "orders_gap_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    isl AS (
      SELECT o_custkey,
             d - CAST(ROW_NUMBER() OVER (
                        PARTITION BY o_custkey ORDER BY d
                      ) AS INTEGER) AS anchor
      FROM d
    ),
    lens AS (
      SELECT o_custkey, anchor, COUNT(*) AS island_len
      FROM isl GROUP BY o_custkey, anchor
    )
    SELECT island_len, COUNT(*) AS n_islands,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM lens GROUP BY island_len
    """,
    tags=("window", "islands"),
)
def orders_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of consecutive ordering days per customer
    via the date-minus-row_number anchor trick, rolled into a histogram
    of island lengths. The window is customer-keyed (bounded groups);
    everything downstream aggregates tiny intermediates."""
    o = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", F.to_date("o_orderdate").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = o.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    lens = isl.groupBy("o_custkey", "anchor").agg(
        F.count("*").alias("island_len")
    )
    return lens.groupBy("island_len").agg(
        F.count("*").alias("n_islands"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "events_top_paths",
    bench=True,
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type)    OVER w AS nxt,
             LEAD(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || nxt || '>' || nxt2 AS path,
           COUNT(*) AS n
    FROM seq WHERE nxt IS NOT NULL AND nxt2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 15
    """,
    tags=("behavior", "paths", "sequence"),
    doc="Clickstream path mining: the 15 most frequent 3-step event-type "
    "sequences across users — two LEADs over the user's event-time order "
    "(one window shuffle on user_id), a concatenated path key, and a "
    "TakeOrdered top-15. The generalization of the transition matrix from "
    "bigrams to k-grams of behavior.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).filter(F.col("nxt").isNotNull() & F.col("nxt2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "nxt", "nxt2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


MK_ITERS = 12
MK_CONV = "purchase"


def _markov_oracle() -> str:
    """K-step absorption chains for every removal variant, unrolled into
    chained CTEs (the pagerank-oracle convention: the Spark loop and the
    SQL unrolling are generated from the same constant, so they cannot
    drift)."""
    its = []
    prev = "it0"
    for i in range(1, MK_ITERS + 1):
        its.append(
            f"""it{i} AS (
      SELECT f.ch, t.dst AS state, SUM(f.p * t.p) AS p
      FROM {prev} f JOIN atrans t ON t.ch = f.ch AND t.src = f.state
      GROUP BY 1, 2
    )"""
        )
        prev = f"it{i}"
    chain = ",\n    ".join(its)
    return f"""
    WITH seq AS (
      SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    fp AS (
      SELECT user_id, MIN(rn) AS fp_rn FROM seq
      WHERE event_type = '{MK_CONV}' GROUP BY user_id
    ),
    path AS (
      SELECT s.user_id, s.event_type, s.rn, fp.fp_rn
      FROM seq s LEFT JOIN fp USING (user_id)
      WHERE fp.fp_rn IS NULL OR s.rn < fp.fp_rn
    ),
    steps AS (
      SELECT COALESCE(LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY rn), 'start') AS src,
             event_type AS dst
      FROM path
    ),
    lastrow AS (SELECT user_id, MAX(rn) AS mx FROM path GROUP BY user_id),
    terminals AS (
      SELECT p.event_type AS src,
             CASE WHEN p.fp_rn IS NOT NULL THEN 'conv' ELSE 'null' END AS dst
      FROM path p JOIN lastrow l ON p.user_id = l.user_id AND p.rn = l.mx
      UNION ALL
      SELECT 'start' AS src, 'conv' AS dst FROM fp WHERE fp_rn = 1
    ),
    trans AS (
      SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS c FROM (
        SELECT src, dst FROM steps UNION ALL SELECT src, dst FROM terminals)
      GROUP BY src, dst
    ),
    probs AS MATERIALIZED (
      SELECT src, dst, c / SUM(c) OVER (PARTITION BY src) AS p FROM trans
    ),
    channels AS (SELECT DISTINCT src AS ch FROM probs WHERE src <> 'start'),
    variants AS (SELECT 'base' AS ch UNION ALL SELECT ch FROM channels),
    vtrans AS (
      SELECT v.ch, p.src,
             CASE WHEN v.ch <> 'base' AND p.dst = v.ch
                  THEN 'null' ELSE p.dst END AS dst,
             SUM(p.p) AS p
      FROM probs p, variants v
      WHERE v.ch = 'base' OR p.src <> v.ch
      GROUP BY 1, 2, 3
    ),
    atrans AS MATERIALIZED (
      SELECT * FROM vtrans
      UNION ALL SELECT ch, 'conv', 'conv', CAST(1.0 AS DOUBLE) FROM variants
      UNION ALL SELECT ch, 'null', 'null', CAST(1.0 AS DOUBLE) FROM variants
    ),
    it0 AS (SELECT ch, 'start' AS state, CAST(1.0 AS DOUBLE) AS p FROM variants),
    {chain},
    cr AS MATERIALIZED (
      SELECT v.ch, COALESCE(SUM(i.p), 0.0) AS cr
      FROM variants v LEFT JOIN {prev} i ON i.ch = v.ch AND i.state = 'conv'
      GROUP BY v.ch),
    base AS (SELECT cr AS base_cr FROM cr WHERE ch = 'base'),
    eff AS (
      SELECT c.ch AS channel, c.cr,
             (SELECT base_cr FROM base) - c.cr AS raw_eff
      FROM cr c WHERE c.ch <> 'base'
    ),
    tot AS (SELECT SUM(raw_eff) AS s FROM eff)
    SELECT channel,
           ROUND((SELECT base_cr FROM base) + 0.00000001, 4) AS base_conv_rate,
           ROUND(cr + 0.00000001, 4) AS conv_rate_without,
           ROUND(CASE WHEN (SELECT base_cr FROM base) = 0 THEN 0.0
                      ELSE 1.0 - cr / (SELECT base_cr FROM base) END
                 + 0.00000001, 4) AS removal_effect,
           ROUND(CASE WHEN (SELECT s FROM tot) = 0 THEN 0.0
                      ELSE raw_eff / (SELECT s FROM tot) END
                 + 0.00000001, 4) AS attribution_share
    FROM eff ORDER BY channel
    """


@register(
    "events_attribution_markov",
    oracle=_markov_oracle(),
    tags=("behavior", "markov", "attribution"),
    doc="Markov removal-effect attribution (the data-driven alternative "
    "to last-touch): per-user journeys up to first purchase become a "
    "first-order chain (start → channels → conv/null absorbers); each "
    "channel's credit is how much the K-step absorption probability of "
    "conv drops when that channel's inbound transitions redirect to "
    "null. The DISTRIBUTED work is the journey scan (one user-keyed "
    "window + one ≤(types+1)² aggregate); the chain itself is a bounded "
    "driver-side table, iterated K=12 steps in plain floats — the same "
    "fixed-iteration-unrolled-into-CTEs oracle discipline as pagerank, "
    "so both engines compute the IDENTICAL K-step value (convergence is "
    "irrelevant to equality). Removal redirects to null without "
    "renormalizing (the standard construction), so effects are "
    "non-negative and shares sum to 1.",
)
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(epoch_us(F.col("ts")), "event_id")
    seq = ev.withColumn("rn", F.row_number().over(w))
    fp = (
        seq.filter(F.col("event_type") == MK_CONV)
        .groupBy("user_id")
        .agg(F.min("rn").alias("fp_rn"))
    )
    j = seq.join(fp, "user_id", "left")
    path = j.filter(F.col("fp_rn").isNull() | (F.col("rn") < F.col("fp_rn")))
    w2 = Window.partitionBy("user_id").orderBy("rn")
    steps = path.select(
        F.coalesce(F.lag("event_type").over(w2), F.lit("start")).alias("src"),
        F.col("event_type").alias("dst"),
    )
    last = path.groupBy("user_id").agg(F.max("rn").alias("mx"))
    terminals = (
        path.join(last, "user_id")
        .filter(F.col("rn") == F.col("mx"))
        .select(
            F.col("event_type").alias("src"),
            F.when(F.col("fp_rn").isNotNull(), F.lit("conv"))
            .otherwise(F.lit("null"))
            .alias("dst"),
        )
    )
    start_conv = (
        fp.filter(F.col("fp_rn") == 1)
        .select(F.lit("start").alias("src"), F.lit("conv").alias("dst"))
    )
    trans = (
        steps.unionAll(terminals)
        .unionAll(start_conv)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bounded driver-side chain: ≤ (|event types| + 1)² rows
    rows = trans.collect()
    totals: dict[str, float] = {}
    for r in rows:
        totals[r.src] = totals.get(r.src, 0.0) + float(r.c)
    probs = [(r.src, r.dst, float(r.c) / totals[r.src]) for r in rows]
    channels = sorted({s for s, _, _ in probs if s != "start"})

    def absorb(removed: str | None) -> float:
        t: dict[str, list[tuple[str, float]]] = {}
        for s, d, p in probs:
            if removed is not None and s == removed:
                continue
            d2 = "null" if (removed is not None and d == removed) else d
            t.setdefault(s, []).append((d2, p))
        t.setdefault("conv", []).append(("conv", 1.0))
        t.setdefault("null", []).append(("null", 1.0))
        vec = {"start": 1.0}
        for _ in range(MK_ITERS):
            nxt: dict[str, float] = {}
            for s, mass in vec.items():
                for d, p in t.get(s, []):
                    nxt[d] = nxt.get(d, 0.0) + mass * p
            vec = nxt
        return vec.get("conv", 0.0)

    base_cr = absorb(None)
    crs = {c: absorb(c) for c in channels}
    s = sum(base_cr - crs[c] for c in channels)
    # zero-denominator guards mirror the oracle's CASE arms exactly: no
    # conversions at all, or removals that change nothing, report 0 credit
    out = [
        (
            c,
            round(base_cr + 1e-8, 4),
            round(crs[c] + 1e-8, 4),
            round((0.0 if base_cr == 0 else 1.0 - crs[c] / base_cr) + 1e-8, 4),
            round((0.0 if s == 0 else (base_cr - crs[c]) / s) + 1e-8, 4),
        )
        for c in channels
    ]
    return spark.createDataFrame(
        out,
        "channel string, base_conv_rate double, conv_rate_without double, "
        "removal_effect double, attribution_share double",
    ).orderBy("channel")


SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]
SHAPLEY_CUTOFF = "2024-01-04"   # exposure window: first 3 days
SHAPLEY_MIN_VALUE = 150         # conversion: a later purchase at least this large


def _shapley_terms() -> dict[str, list[tuple[float, str, str]]]:
    """Per channel: (weight, key(S∪c), key(S)) over every subset S of the
    other channels — the exact Shapley formula for n=4, generated once and
    shared by the Spark driver loop and the SQL oracle so they cannot
    drift. Weights are |S|!·(n−1−|S|)!/n! as shortest-repr doubles (both
    engines parse them to the identical IEEE value)."""
    from itertools import combinations
    from math import factorial

    n = len(SHAPLEY_CHANNELS)
    out: dict[str, list[tuple[float, str, str]]] = {}
    for c in SHAPLEY_CHANNELS:
        rest = [x for x in SHAPLEY_CHANNELS if x != c]
        terms = []
        for k in range(n):
            for s in combinations(rest, k):
                w = factorial(k) * factorial(n - 1 - k) / factorial(n)
                with_c = ",".join(sorted(s + (c,)))
                without = ",".join(s)
                terms.append((w, with_c, without))
        out[c] = terms
    return out


def _shapley_oracle() -> str:
    def v(key: str) -> str:
        return f"COALESCE((SELECT rate FROM vals WHERE key = '{key}'), 0.0)"

    rows = []
    for c, terms in _shapley_terms().items():
        expr = " + ".join(f"{w!r} * ({v(a)} - {v(b)})" for w, a, b in terms)
        rows.append(f"('{c}', {expr})")
    values = ",\n      ".join(rows)
    return f"""
    WITH x AS (
      SELECT user_id,
             string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS key
      FROM events
      WHERE CAST(ts AS DATE) < DATE '{SHAPLEY_CUTOFF}'
        AND event_type <> '{MK_CONV}'
      GROUP BY user_id
    ),
    c AS (
      SELECT user_id,
             BOOL_OR(event_type = '{MK_CONV}'
                     AND CAST(ts AS DATE) >= DATE '{SHAPLEY_CUTOFF}'
                     AND value >= {SHAPLEY_MIN_VALUE}) AS conv
      FROM events GROUP BY user_id
    ),
    uk AS (
      SELECT c.user_id, COALESCE(x.key, '') AS key, c.conv
      FROM c LEFT JOIN x USING (user_id)
    ),
    vals AS MATERIALIZED (
      SELECT key,
             CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS rate
      FROM uk GROUP BY key
    ),
    phi(channel, raw) AS (
      VALUES
      {values}
    ),
    tot AS (SELECT SUM(raw) AS s FROM phi)
    SELECT channel,
           ROUND(raw + 0.00000001, 4) AS shapley_value,
           ROUND(CASE WHEN (SELECT s FROM tot) = 0 THEN 0.0
                      ELSE raw / (SELECT s FROM tot) END
                 + 0.00000001, 4) AS shapley_share
    FROM phi ORDER BY channel
    """


@register(
    "events_attribution_shapley",
    oracle=_shapley_oracle(),
    tags=("behavior", "shapley", "attribution"),
    doc="Shapley-value attribution — the coalition-game companion to the "
    "Markov removal effect (events_attribution_markov). DISJOINT windows "
    "keep the game honest: the coalition is the set of non-purchase "
    "channels a user touched in the first three days, the outcome is a "
    "later high-value purchase — exposure cannot mechanically compete "
    "with the outcome for event slots (the exactly-S formulation on a "
    "shared window drives every marginal negative). v(S) is the observed "
    "outcome rate of users with coalition exactly S (v(∅) = the organic "
    "baseline); credit is the exact n=4 Shapley sum, efficiency "
    "Σφ = v(grand) − v(∅) by construction. The distributed work is two "
    "map-side-combined aggregates over the fact table into ≤2ⁿ coalition "
    "rows; the game arithmetic runs on that bounded table — driver-side "
    "in Spark, a generated VALUES expression over a MATERIALIZED CTE in "
    "the oracle, both from the same generated term list.",
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "value")
    x = (
        ev.filter(
            (F.to_date("ts") < F.lit(SHAPLEY_CUTOFF))
            & (F.col("event_type") != MK_CONV)
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("key")
        )
    )
    c = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == MK_CONV)
                & (F.to_date("ts") >= F.lit(SHAPLEY_CUTOFF))
                & (F.col("value") >= SHAPLEY_MIN_VALUE),
                True,
            ).otherwise(False)
        ).alias("conv")
    )
    uk = c.join(x, "user_id", "left").select(
        F.coalesce("key", F.lit("")).alias("key"), "conv"
    )
    vals = uk.groupBy("key").agg(
        (
            F.sum(F.when(F.col("conv"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("rate")
    )
    # bounded driver-side game table: ≤ 2^n coalition rows
    v = {r["key"]: r["rate"] for r in vals.collect()}
    phi = {
        c_: sum(w_ * (v.get(a, 0.0) - v.get(b, 0.0)) for w_, a, b in terms)
        for c_, terms in _shapley_terms().items()
    }
    s = sum(phi.values())
    # degenerate game (e.g. no qualifying outcomes): shares report 0, the
    # oracle's CASE arm exactly
    out = [
        (
            c_,
            round(phi[c_] + 1e-8, 4),
            round((0.0 if s == 0 else phi[c_] / s) + 1e-8, 4),
        )
        for c_ in sorted(phi)
    ]
    return spark.createDataFrame(
        out, "channel string, shapley_value double, shapley_share double"
    ).orderBy("channel")
