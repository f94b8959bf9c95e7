#!/usr/bin/env python
"""Incremental search-index scaling: steady-state batch wall and probe
wall vs accumulated index size.

Prebuilds the index at 1×/4×/16× history (replica-scaled documents, the
``scaling_curve.py`` convention, ingested through the REAL processor as a
backfill batch), then times (a) one fixed-size novel micro-batch through
the steady-state ``foreachBatch`` path and (b) the ``bm25_over_index``
probe. The claim under test: neither grows with history — the batch cost
is tokenize + the batch's own sidecar bands + three appends; the probe
cost is the query terms' bucket directories.

Usage: python tools/search_stream_scaling.py [--base /root/testdata/sf0.1]
         [--scales 1,4,16] [--batch-docs 12] [--repeats 3]
         [--out /tmp/festvibes_search_scale]
Writes one JSON line + a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from probe_scaling import build_history_docs, log  # noqa: E402

TERMS = ["merge", "hash", "window"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--batch-docs", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="/tmp/festvibes_search_scale")
    args = ap.parse_args()
    scales = [int(x) for x in args.scales.split(",")]
    os.makedirs(args.out, exist_ok=True)
    # per-run nonce: a second run over a persisted --out must not replay
    # run 1's timed batches — the append-only-per-id guard would skip every
    # doc and under-report the batch wall
    run_nonce = int(time.time()) % 1_000_000

    from pyspark.sql import functions as F

    from fest_vibes_ai_etl_spark.session import get_spark
    from fest_vibes_ai_etl_spark.streaming import incremental_search as inc

    spark = get_spark("search-stream-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    batch_walls: dict[int, float] = {}
    probe_walls: dict[int, float] = {}
    index_docs: dict[int, int] = {}
    for r in scales:
        docs_dir = build_history_docs(args.base, args.out, r)
        idx = os.path.join(args.out, f"sidx_x{r}")
        stamp = os.path.join(idx, "_PREBUILT")
        proc = inc.make_search_index_processor(idx, n_term_buckets=64)
        if not os.path.exists(stamp):
            hist = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
            t0 = time.perf_counter()
            proc(hist, 0)
            log(f"x{r}: backfill batch ({hist.count()} docs) "
                f"{time.perf_counter() - t0:.1f}s")
            # record the PREBUILT doc count in the stamp: a rerun against
            # a persisted --out would otherwise count the prior run's
            # nonce-distinct timed batches into index_docs and drift the
            # history ratios / fitted slope across reruns
            Path(stamp).write_text(json.dumps(
                {"index_docs": spark.read.parquet(idx + "/doclen").count()}
            ))
        try:
            index_docs[r] = json.loads(Path(stamp).read_text())["index_docs"]
        except (ValueError, KeyError):  # pre-round-12 empty stamp
            index_docs[r] = (
                spark.read.parquet(idx + "/doclen")
                .filter("doc_id < 900000000")
                .count()
            )
        best = math.inf
        for i in range(args.repeats):
            # each timed run is a GENUINE novel batch (distinct salt+ids):
            # a replayed batch appends nothing and under-reports
            batch = (
                spark.read.parquet(os.path.join(args.base, "documents.parquet"))
                .orderBy("doc_id")
                .limit(args.batch_docs)
                .select(
                    (F.col("doc_id") + 900_000_000 + run_nonce * 100_000_000 + i * 1_000_000).alias("doc_id"),
                    F.regexp_replace("text", r"(\S+)", f"$1zq{run_nonce}r{r}x{i}").alias("text"),
                )
            ).localCheckpoint()
            t0 = time.perf_counter()
            proc(batch, 100 + i)
            best = min(best, time.perf_counter() - t0)
        batch_walls[r] = round(best, 3)
        best_p = math.inf
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            inc.bm25_over_index(spark, idx, TERMS, topn=10).collect()
            best_p = min(best_p, time.perf_counter() - t0)
        probe_walls[r] = round(best_p, 3)
        log(f"x{r}: docs={index_docs[r]} batch={batch_walls[r]}s "
            f"probe={probe_walls[r]}s")

    def slope(series: dict[int, float]) -> float | None:
        ks = sorted(series)
        if len(ks) < 2 or series[ks[0]] <= 0:
            return None
        return round(
            math.log(series[ks[-1]] / series[ks[0]]) / math.log(ks[-1] / ks[0]), 3
        )

    result = {
        "metric": "search_stream_scaling",
        "batch_docs": args.batch_docs,
        "index_docs": index_docs,
        "batch_wall": batch_walls,
        "probe_wall": probe_walls,
        "batch_b": slope(batch_walls),
        "probe_b": slope(probe_walls),
    }
    print("| scale | index docs | batch wall (s) | probe wall (s) |")
    print("|---|---|---|---|")
    for r in scales:
        print(f"| x{r} | {index_docs[r]} | {batch_walls[r]} | {probe_walls[r]} |")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
