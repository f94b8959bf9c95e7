"""Build every persisted query-acceleration artifact for a scale factor —
the nightly index-build job of the deployment story.

Each store follows the same build/probe economics: one amortized build pass
keyed by (sf, params, source fingerprint), after which every query in its
family starts from a parquet scan with zero build shuffles:

- customer–supplier graph edge+degree store (PageRank / BFS / degree stats)
- IVF ANN index, cell-partitioned (approximate + full-probe cosine top-k)
- PQ code table (ADC compressed-domain scans, IVF-PQ)
- PPJoin shingle-signature table (exact Jaccard pair mining, transitive
  clustering, dedup-aware splitting)
- MinHash signature table (LSH banding — the sketch half of the dedup index)

Usage: python tools/build_stores.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("build-stores")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fest_vibes_ai_etl_spark.operators import dedup, ivf, vectorml
    from fest_vibes_ai_etl_spark.operators.search import (
        load_or_build_postings_store,
    )
    from fest_vibes_ai_etl_spark.plans.graph import load_or_build_cs_edges
    from fest_vibes_ai_etl_spark.sources import table

    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")

    builds = [
        ("cs_graph_edges", lambda: load_or_build_cs_edges(spark, sf_dir)),
        ("ivf_index", lambda: ivf.load_or_build_index(spark, emb, sf_dir, k=16, seed=42)),
        ("pq_codes", lambda: vectorml.load_or_build_pq_codes(spark, emb, sf_dir, 4, 8, 64)),
        ("shingle_sig", lambda: dedup.load_or_build_signature_store(spark, docs, sf_dir)),
        ("minhash_sig", lambda: dedup.load_or_build_minhash_store(spark, docs, sf_dir)),
        # term-bucketed lexical index (round 12: the shared stream/batch
        # artifact — every BM25/Rocchio/RRF/rerank query probes it)
        ("postings_store", lambda: load_or_build_postings_store(spark, docs, sf_dir)),
    ]
    for name, build in builds:
        t0 = time.time()
        build()
        print(f"{name}: ready in {time.time() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
