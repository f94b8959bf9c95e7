#!/usr/bin/env python
"""Scaling-curve harness for the heavy operator family (BASELINE.md §5).

All 100-TB claims in SCALE.md rest on sf0.1 measurements plus shuffle
arithmetic. This tool adds OBSERVED growth exponents: it materializes
replica-scaled copies of the tables the heavy family reads (documents,
embeddings, orders, lineitem) at 1×/4×/16× of sf0.1, times each operator
at every scale, and fits the slope  b  of  t = a·n^b  between successive
scales (b ≈ 1 → linear, the design claim for every bucketed path).

Scaled-data construction (disjoint key spaces — the point, not a cheat):

- ``documents``: replica r offsets doc_id by r·K and suffixes EVERY token
  with ``r`` (DuckDB regexp), so replicas share zero shingles. Planted
  intra-replica near-dups are preserved exactly; cross-replica candidate
  pairs are zero BY CONSTRUCTION — which is precisely the bucketed-scaling
  property (bands/buckets don't mix across unrelated corpus slices). A
  quadratic path (all-pairs) would still blow up inside each replica's
  buckets if the pruning were broken.
- ``embeddings``: vec_id offset; vectors perturbed per replica by a
  deterministic per-dimension nudge so replica cells don't collapse onto
  identical centroids.
- ``orders``/``lineitem``: all join keys offset per replica → r disjoint
  copies of the customer-supplier graph; pagerank cost grows with edges.

Writes one JSON line (machine-readable) and a markdown table to stdout.
Usage:  python tools/scaling_curve.py [--base /root/testdata/sf0.1]
                                      [--replicas 1,4,16] [--out /tmp/festvibes_scale]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUERIES = (
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_ivf_topk",
    "graph_pagerank_suppliers",
    "dedup_duplicate_spans",
    "corpus_dsir_selection",
)


def build_scaled(base: str, out_dir: str, r: int) -> str:
    """Materialize the r× copy under out_dir/x{r}; cached once built."""
    import duckdb

    dst = os.path.join(out_dir, f"x{r}")
    if os.path.exists(os.path.join(dst, "_BUILT")):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    K_DOC, K_VEC, K_ORD, K_CUST, K_SUPP = (
        10_000_000, 10_000_000, 100_000_000, 10_000_000, 10_000_000,
    )
    reps = ", ".join(str(i) for i in range(r))
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + rep.i * {K_DOC} AS doc_id,
                 CASE WHEN rep.i = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+)', '\\1' || rep.i, 'g')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{base}/documents.parquet' d, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + rep.i * {K_VEC} AS vec_id,
                 CASE WHEN rep.i = 0 THEN e.embedding
                      ELSE list_transform(
                        list_zip(e.embedding,
                                 range(1, len(e.embedding) + 1)),
                        z -> CAST(z[1] + 0.01 * rep.i *
                                  sin(CAST(z[2] AS DOUBLE)) AS FLOAT))
                 END AS embedding,
                 e.label
          FROM '{base}/embeddings.parquet' e, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT o.o_orderkey + rep.i * {K_ORD} AS o_orderkey,
                 o.o_custkey + rep.i * {K_CUST} AS o_custkey,
                 o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
          FROM '{base}/orders.parquet' o, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/orders.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT l.l_orderkey + rep.i * {K_ORD} AS l_orderkey,
                 l.l_partkey,
                 l.l_suppkey + rep.i * {K_SUPP} AS l_suppkey,
                 l.l_linenumber, l.l_quantity, l.l_extendedprice,
                 l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus,
                 l.l_shipdate
          FROM '{base}/lineitem.parquet' l, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/lineitem.parquet' (FORMAT parquet)
        """
    )
    con.close()
    Path(dst, "_BUILT").touch()
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", default="1,4,16")
    ap.add_argument("--out", default="/tmp/festvibes_scale")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the default query set to run",
    )
    args = ap.parse_args()
    replicas = [int(x) for x in args.replicas.split(",")]
    global QUERIES
    if args.queries:
        QUERIES = tuple(q for q in args.queries.split(",") if q)

    from fest_vibes_ai_etl_spark.plans.catalog import REGISTRY, queries
    from fest_vibes_ai_etl_spark.session import get_spark

    queries()
    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    builds: dict[int, float] = {}
    for r in replicas:
        sf_dir = build_scaled(args.base, args.out, r)
        # one-off store builds (IVF index, signature store, edge store) are
        # the BUILD series; probes/queries are timed warm, stores in place.
        t0 = time.perf_counter()
        for q in QUERIES:
            spec = REGISTRY[q]
            if spec.prepare is not None:
                spec.prepare(spark, sf_dir)
        builds[r] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        for q in QUERIES:
            spec = REGISTRY[q]
            spec.fn(spark, sf_dir).count()  # warm (codegen, stores hot)
            best = math.inf
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            results[q][r] = round(best, 3)
            spark.catalog.clearCache()
        print(f"# x{r}: build={builds[r]}s " +
              " ".join(f"{q}={results[q][r]}s" for q in QUERIES), file=sys.stderr)

    def slope(series: dict[int, float]) -> float | None:
        rs = sorted(series)
        if len(rs) < 2:
            return None
        if series[rs[0]] <= 0 or series[rs[-1]] <= 0:
            return None  # e.g. zero build time: every store already staged
        num = math.log(series[rs[-1]] / series[rs[0]])
        den = math.log(rs[-1] / rs[0])
        return round(num / den, 2)

    out = {
        "base": args.base,
        "replicas": replicas,
        "build_sec": builds,
        "queries": results,
        "slopes": {q: slope(results[q]) for q in QUERIES},
        "build_slope": slope(builds),
    }
    print(json.dumps(out))
    print("\n| query | " + " | ".join(f"x{r}" for r in replicas) +
          " | slope b (t∝n^b) |")
    print("|---|" + "---|" * (len(replicas) + 1))
    for q in QUERIES:
        print(f"| {q} | " +
              " | ".join(f"{results[q][r]}s" for r in replicas) +
              f" | {out['slopes'][q]} |")
    print(f"| store builds (IVF+signatures+edges) | " +
          " | ".join(f"{builds[r]}s" for r in replicas) +
          f" | {out['build_slope']} |")


if __name__ == "__main__":
    main()
