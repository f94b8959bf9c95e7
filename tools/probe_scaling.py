#!/usr/bin/env python
"""Incremental-dedup history-probe scaling: bucketed index vs full scan.

The round-6 verdict's one scale exposure: the incremental span/near dedup
streams re-derived their probe side from the ENTIRE stored corpus on every
micro-batch — linear per batch, quadratic over a backfill. Round 7 adds the
band-partitioned sidecar (``streaming/banded_index.py``). This tool measures
what that buys: it prebuilds accumulated history at 1×/4×/16× (replica-
scaled documents with disjoint ids and per-replica token salting, the
``scaling_curve.py`` convention), then times ONE fixed-size micro-batch
through the real ``foreachBatch`` path under ``history_probe="scan"`` vs
``"bucketed"``, and fits b in  wall = a·history^b  for each.

What to expect (and why, so the numbers aren't read naively):

- near-dedup probes are FP-SPARSE (``bands``=8 hashes per doc), so a small
  batch touches a tiny fraction of a well-sized bucket set → strongly
  sublinear walls.
- span-dedup probes are FP-DENSE (~2/(w+1) fingerprints per gram, ~10² per
  doc), so directory pruning rates ``touched/n_bands``; the structural win
  that holds even when every band is touched is that the per-batch explode
  of every stored row's array is GONE (the index is pre-exploded once, at
  append time) and the join is bucket-co-located. Slope drops accordingly;
  a true bulk backfill should use the batch-mode operators, not a
  micro-batch stream, regardless of index.

Usage: python tools/probe_scaling.py [--base /root/testdata/sf0.1]
         [--scales 1,4,16] [--batch-docs 12] [--n-bands 2048]
         [--family span|near|both] [--out /tmp/festvibes_probe_scale]
Writes one JSON line + a markdown table to stdout.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_history_docs(base: str, out_dir: str, r: int) -> str:
    """r× replicated documents with disjoint ids and salted tokens (no
    cross-replica shared shingles), cached under out_dir/docs_x{r}."""
    import duckdb

    dst = os.path.join(out_dir, f"docs_x{r}")
    if os.path.exists(os.path.join(dst, "_BUILT")):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    reps = ", ".join(str(i) for i in range(r))
    duckdb.connect().execute(
        f"""
        COPY (
          SELECT d.doc_id + rep.i * CAST(10000000 AS BIGINT) AS doc_id,
                 CASE WHEN rep.i = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+)', '\\1' || rep.i, 'g')
                 END AS text
          FROM '{base}/documents.parquet' d, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )
    Path(dst, "_BUILT").touch()
    return dst


def prebuild_span_corpus(spark, docs_dir: str, corpus_dir: str, k, w) -> None:
    """History in the span-stream's storage shape: (doc_id, text, fp, wfps)."""
    from pyspark.sql import functions as F

    from fest_vibes_ai_etl_spark.operators.dedup import winnow_fingerprints
    from fest_vibes_ai_etl_spark.streaming.incremental_dedup import fingerprint

    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    wf = winnow_fingerprints(docs, "doc_id", "text", k=k, w=w)
    wfps = wf.groupBy("id").agg(F.array_sort(F.collect_list("fp")).alias("wfps"))
    (
        docs.withColumn("fp", fingerprint("text"))
        .join(wfps.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumn("wfps", F.coalesce("wfps", F.array().cast("array<long>")))
        .write.mode("overwrite")
        .parquet(corpus_dir)
    )


def prebuild_near_corpus(spark, docs_dir: str, corpus_dir: str, k, num_hashes) -> None:
    from fest_vibes_ai_etl_spark.streaming.incremental_near_dedup import (
        _with_signatures,
    )

    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    _with_signatures(docs, "doc_id", "text", k, num_hashes).write.mode(
        "overwrite"
    ).parquet(corpus_dir)


def write_batch_source(spark, base: str, src_dir: str, n_docs: int,
                       salt: str = "zq", id_off: int = 900_000_000) -> None:
    """Fixed probe batch: novel docs (salted differently from every replica)."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(os.path.join(base, "documents.parquet"))
        .orderBy("doc_id")
        .limit(n_docs)
        .select(
            (F.col("doc_id") + id_off).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", "$1" + salt).alias("text"),
        )
    )
    docs.coalesce(1).write.mode("overwrite").parquet(src_dir)


def write_neardup_source(spark, base: str, src_dir: str, n_docs: int) -> None:
    """A batch of TRUE near-dups of replica-0 history: original texts with
    a couple of appended tokens (token-3-gram Jaccard ≈ 0.9 on typical doc
    lengths — far over the stream's threshold), under fresh ids."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(os.path.join(base, "documents.parquet"))
        .orderBy("doc_id")
        .limit(n_docs)
        .select(
            (F.col("doc_id") + 950_000_000).alias("doc_id"),
            F.concat("text", F.lit(" encore finale")).alias("text"),
        )
    )
    docs.coalesce(1).write.mode("overwrite").parquet(src_dir)


def verify_column_bytes(corpus_dir: str) -> int:
    """Compressed parquet bytes of the (doc_id, sh, n) columns — exactly
    what one launched exact-Jaccard verify scans from the corpus (it
    reads those three columns of every stored row; candidate ids only
    prune AFTER the scan feeds the join)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT path_in_schema, SUM(total_compressed_size)
        FROM parquet_metadata('{corpus_dir}/*.parquet')
        GROUP BY 1
        """
    ).fetchall()
    return int(
        sum(
            b
            for col, b in rows
            if col == "doc_id" or col == "n" or col.startswith("sh.")
        )
    )


def measure_verify_gate(spark, base: str, out: str, work_corpus: str,
                        batch_docs: int, n_bands: int) -> dict:
    """Round-9 measurement (r8 verdict #5): how often does the near
    stream's emptiness gate actually LAUNCH the candidate-gated
    exact-Jaccard verify — the family's one acknowledged linear term —
    and what does a launch cost? Runs two more micro-batches through the
    real processor against the timed run's surviving work corpus: one
    all-novel (steady ingest, the common case) and one carrying true
    near-dups of history (the case the verify exists for)."""
    from fest_vibes_ai_etl_spark.streaming.incremental_near_dedup import (
        make_near_dedup_processor,
    )

    src_novel2 = os.path.join(out, "batch_src_novel2")
    src_dup = os.path.join(out, "batch_src_dup")
    write_batch_source(spark, base, src_novel2, batch_docs,
                       salt="vg", id_off=920_000_000)
    write_neardup_source(spark, base, src_dup, batch_docs)
    metrics: dict = {}
    proc = make_near_dedup_processor(
        work_corpus, n_buckets=n_bands, metrics=metrics
    )
    proc(spark.read.parquet(src_novel2), 0)
    novel_launched = metrics.get("verify_launched", 0)
    proc(spark.read.parquet(src_dup), 1)
    return {
        "hist_rows": spark.read.parquet(work_corpus).count(),
        "novel_batch_verify_launched": novel_launched,
        "dup_batch_verify_launched": metrics.get("verify_launched", 0)
        - novel_launched,
        "verify_cand_pairs": metrics.get("verify_cand_pairs", 0),
        "verify_scan_bytes_per_launch": verify_column_bytes(work_corpus),
    }


def run_one_batch(spark, family: str, src: str, corpus: str, ckpt: str,
                  mode: str, n_bands: int) -> float:
    from fest_vibes_ai_etl_spark.streaming.incremental_near_dedup import (
        start_incremental_near_dedup,
    )
    from fest_vibes_ai_etl_spark.streaming.incremental_span_dedup import (
        start_incremental_span_dedup,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    if family == "span":
        q = start_incremental_span_dedup(
            stream, corpus, ckpt, k=20, w=15, min_shared=3,
            n_bands=n_bands, history_probe=mode,
        )
    else:
        q = start_incremental_near_dedup(
            stream, corpus, ckpt, k=3, num_hashes=32, bands=8, threshold=0.2,
            n_buckets=n_bands, history_probe=mode,
        )
    q.awaitTermination(600)
    return time.perf_counter() - t0


def fit_b(scales, walls) -> float:
    if len(set(scales)) < 2:
        return float("nan")  # a slope needs two distinct scale points
    xs = [math.log(s) for s in scales]
    ys = [math.log(max(w, 1e-9)) for w in walls]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--batch-docs", type=int, default=12)
    ap.add_argument("--n-bands", type=int, default=2048)
    ap.add_argument("--family", default="both", choices=["span", "near", "both"])
    ap.add_argument("--out", default="/tmp/festvibes_probe_scale")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    families = ["span", "near"] if args.family == "both" else [args.family]

    from fest_vibes_ai_etl_spark.session import get_spark
    from fest_vibes_ai_etl_spark.streaming.banded_index import (
        BandedFingerprintIndex,
    )
    from fest_vibes_ai_etl_spark.streaming.incremental_near_dedup import (
        _band_hashes,
        near_index_path,
    )
    from fest_vibes_ai_etl_spark.streaming._exact_guard import (
        _exact_pairs,
        exact_index_path,
    )
    from fest_vibes_ai_etl_spark.streaming.incremental_span_dedup import (
        span_index_path,
    )
    from pyspark.sql import functions as F

    spark = get_spark()
    os.makedirs(args.out, exist_ok=True)
    src = os.path.join(args.out, "batch_src")
    write_batch_source(spark, args.base, src, args.batch_docs)

    results: dict[str, dict] = {}
    for fam in families:
        walls: dict[str, list[float]] = {"scan": [], "bucketed": []}
        guard_reads: list[dict] = []
        warmed = False
        for r in scales:
            docs_dir = build_history_docs(args.base, args.out, r)
            proto = os.path.join(args.out, f"{fam}_hist_x{r}")
            if not os.path.exists(os.path.join(proto, "_SUCCESS")):
                log(f"[{fam}] building x{r} history corpus ...")
                if fam == "span":
                    prebuild_span_corpus(spark, docs_dir, proto, 20, 15)
                else:
                    prebuild_near_corpus(spark, docs_dir, proto, 3, 32)
            # prebuild the index once per scale so the timed run measures
            # the steady-state probe, not the one-time migration
            idx_proto = (
                span_index_path(proto) if fam == "span" else near_index_path(proto)
            )
            exact_proto = exact_index_path(proto)
            # cached protos built by early-round-8 runs predate the
            # in-directory _meta.json; since round 9 a meta-less index
            # REFUSES (invalidate+rebuild is the only safe upgrade), so a
            # stale cached proto would make every timed batch pay a
            # silent rebuild — rebuild it ONCE here instead, after which
            # the cache carries its meta
            for stale in (idx_proto, exact_proto):
                if (
                    os.path.exists(stale)
                    and not os.path.exists(os.path.join(stale, "_meta.json"))
                    and not os.path.exists(stale.rstrip("/") + "_meta.json")
                ):
                    log(f"[{fam}] cached index {stale} predates _meta.json "
                        f"— rebuilding once")
                    shutil.rmtree(stale)
            if not os.path.exists(idx_proto):
                log(f"[{fam}] building x{r} index ...")
                hist = spark.read.parquet(proto)
                if fam == "span":
                    idx = BandedFingerprintIndex(idx_proto, "fp", args.n_bands)
                    idx.build_from(
                        hist.select(
                            F.col("doc_id").alias("id"),
                            F.explode("wfps").alias("fp"),
                        )
                    )
                else:
                    idx = BandedFingerprintIndex(
                        idx_proto, "band_hash", args.n_bands
                    )
                    idx.build_from(
                        _band_hashes(hist, "doc_id", 32, 8).select(
                            F.col("bid").alias("id"), "band", "band_hash"
                        )
                    )
            if not os.path.exists(exact_proto):
                # the round-8 exact-fp sidecar: prebuilt too, so the timed
                # run measures the steady-state probe, not the migration
                log(f"[{fam}] building x{r} exact index ...")
                hist = spark.read.parquet(proto)
                BandedFingerprintIndex(exact_proto, "fpk", args.n_bands).build_from(
                    _exact_pairs(hist, "doc_id")
                )
            # exact-guard read volume: rows the bucket-local replay guard
            # actually reads for THIS batch (touched fpk bands only) vs
            # the full history the pre-round-8 guard re-scanned per batch.
            # rows_read ≈ touched_bands × hist/n_bands: the linear term
            # keeps a 1/n_bands constant, and n_bands is sized to the
            # corpus at (re)build time — this is the number that must stay
            # small while hist_rows grows 512×.
            from fest_vibes_ai_etl_spark.streaming._exact_guard import _fpk
            from fest_vibes_ai_etl_spark.streaming.incremental_dedup import (
                fingerprint,
            )

            eidx = BandedFingerprintIndex(exact_proto, "fpk")  # adopt meta
            ebands = eidx.touched_bands(
                spark.read.parquet(src)
                .select(fingerprint("text").alias("fp"))
                .select(_fpk())
            )
            erows = eidx.read_bands(spark, ebands)
            guard_reads.append(
                {
                    "scale": r,
                    "hist_rows": spark.read.parquet(proto).count(),
                    "exact_rows_read": 0 if erows is None else erows.count(),
                }
            )
            log(f"[{fam}] x{r} exact-guard rows read: {guard_reads[-1]}")
            for mode in ("scan", "bucketed"):
                # the batch APPENDS; run each mode against a throwaway copy
                reps = 2 if not warmed else 1  # first timing discards a
                for rep in range(reps):        # JVM/stream warmup pass
                    work = os.path.join(args.out, "work")
                    shutil.rmtree(work, ignore_errors=True)
                    corpus = os.path.join(work, "corpus")
                    shutil.copytree(proto, corpus)
                    if mode == "bucketed":
                        # scan mode INVALIDATES any existing index on its
                        # first batch (stale-index guard) — copying one in
                        # would both waste setup and put the recursive
                        # delete of thousands of band dirs on the timer
                        idx_dst = (
                            span_index_path(corpus) if fam == "span"
                            else near_index_path(corpus)
                        )
                        for src_d, dst_d in (
                            (idx_proto, idx_dst),
                            (exact_proto, exact_index_path(corpus)),
                        ):
                            shutil.copytree(src_d, dst_d)
                            meta = src_d.rstrip("/") + "_meta.json"
                            if os.path.exists(meta):
                                shutil.copy(meta, dst_d.rstrip("/") + "_meta.json")
                    wall = run_one_batch(
                        spark, fam, src, corpus, os.path.join(work, "ckpt"),
                        mode, args.n_bands,
                    )
                    if reps == 2 and rep == 0:
                        log(f"[{fam}] x{r} {mode} (warmup, discarded): {wall:.2f}s")
                        continue
                    walls[mode].append(wall)
                    log(f"[{fam}] x{r} {mode}: {wall:.2f}s")
            warmed = True
        results[fam] = {
            "scales": scales,
            "walls": {m: [round(w, 3) for w in ws] for m, ws in walls.items()},
            "b": {m: round(fit_b(scales, ws), 3) for m, ws in walls.items()},
            "exact_guard": guard_reads,
        }
        if fam == "near":
            # verify-trigger telemetry at the LARGEST accumulated history,
            # against the timed loop's surviving bucketed work corpus
            log("[near] measuring verify-gate trigger rate ...")
            results[fam]["verify_gate"] = measure_verify_gate(
                spark, args.base, args.out,
                os.path.join(args.out, "work", "corpus"),
                args.batch_docs, args.n_bands,
            )
            log(f"[near] verify gate: {results[fam]['verify_gate']}")

    print(json.dumps({"probe_scaling": results,
                      "batch_docs": args.batch_docs,
                      "n_bands": args.n_bands}))
    print("\n| family | mode | " + " | ".join(f"x{s}" for s in scales) + " | b |")
    print("|---|---|" + "---|" * (len(scales) + 1))
    for fam, res in results.items():
        for mode in ("scan", "bucketed"):
            row = " | ".join(f"{w:.2f}s" for w in res["walls"][mode])
            print(f"| {fam} | {mode} | {row} | {res['b'][mode]:.2f} |")


if __name__ == "__main__":
    main()
