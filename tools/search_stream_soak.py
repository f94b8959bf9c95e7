#!/usr/bin/env python
"""Long-horizon soak of the incremental search index: the small-file
effect appears with BATCH COUNT, not history size (every micro-batch
appends one file per touched tb= bucket + doclen files), so the scaling
tool's 3-point history sweep cannot see it. This drives N small batches
through the real processor and records, every ``--every`` batches:

- the bm25_over_index probe wall (best of --repeats),
- the file census (total postings files, max files in one bucket,
  doclen files).

Run once with maintenance off (the pre-round-12 behavior: census grows
one file per bucket per batch, probe wall drifts up with listing/footer
cost) and once with the processor's maintain_every tick on (census
bounded, probe wall flat) — the pair is the evidence SCALE.md records.

``--deletes-every N`` / ``--revises-every M`` (round 13) interleave the
OPERATIONAL load: every N batches one previously-indexed doc is
tombstoned (delete_from_search_index, between batches per the
single-writer rule), every M batches one is revised
(revise_search_document). The census then also tracks the tombstone /
revision / _rev-sidecar file counts — the claim under test is that the
delete/update machinery itself has a steady state: probe wall flat,
every side-directory census bounded, correctness maintained (the probe
must never return a tombstoned id, and revised docs rank under their
new content).

Usage: python tools/search_stream_soak.py [--batches 500] [--every 50]
         [--batch-docs 4] [--repeats 3] [--maintain-every 16]
         [--no-maintain] [--deletes-every 0] [--revises-every 0]
         [--out /tmp/festvibes_search_soak]
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

TERMS = ["merge", "hash", "window"]
FILLER = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu"
).split()


def census(idx: str) -> dict:
    post_files = 0
    max_bucket = 0
    pdir = os.path.join(idx, "postings")
    if os.path.isdir(pdir):
        for name in os.listdir(pdir):
            d = os.path.join(pdir, name)
            if not (name.startswith("tb=") and os.path.isdir(d)):
                continue
            n = sum(
                1
                for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
            post_files += n
            max_bucket = max(max_bucket, n)
    def _flat(d: str) -> int:
        if not os.path.isdir(d):
            return 0
        return sum(
            1
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )

    return {
        "postings_files": post_files,
        "max_bucket_files": max_bucket,
        "doclen_files": _flat(os.path.join(idx, "doclen")),
        "tombstone_files": _flat(idx.rstrip("/") + "_tombstones"),
        "revision_files": _flat(idx.rstrip("/") + "_revisions"),
        "rev_store_files": _flat(idx.rstrip("/") + "_rev/terms"),
        # round 14: probes are on the no-revisions ZERO-added-plan fast
        # path exactly when the marker dir is gone (absorption folded the
        # edits into the main store) — the claim under test with
        # --revises-every 1 is that this keeps RE-ENGAGING between ticks
        "fast_path": not os.path.isdir(idx.rstrip("/") + "_revisions"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=500)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--batch-docs", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--maintain-every", type=int, default=16)
    ap.add_argument("--no-maintain", action="store_true")
    ap.add_argument("--deletes-every", type=int, default=0)
    ap.add_argument("--revises-every", type=int, default=0)
    ap.add_argument("--out", default="/tmp/festvibes_search_soak")
    args = ap.parse_args()

    from fest_vibes_ai_etl_spark.session import get_spark
    from fest_vibes_ai_etl_spark.streaming import incremental_search as inc

    spark = get_spark("search-stream-soak")
    spark.sparkContext.setLogLevel("ERROR")

    mode = "nomaint" if args.no_maintain else f"maint{args.maintain_every}"
    idx = os.path.join(args.out, f"soak_{mode}")
    proc = inc.make_search_index_processor(
        idx,
        n_term_buckets=64,
        maintain_every=None if args.no_maintain else args.maintain_every,
    )
    points: list[dict] = []
    deleted: set[int] = set()
    last_revised: int | None = None
    t_start = time.perf_counter()
    for i in range(args.batches):
        rows = []
        for j in range(args.batch_docs):
            doc_id = i * args.batch_docs + j
            words = [FILLER[(doc_id * 7 + w) % len(FILLER)] for w in range(12)]
            words += [TERMS[doc_id % 3], f"nonce{doc_id}"]
            rows.append((doc_id, " ".join(words)))
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        proc(batch, i)
        # operational load between batches (the single-writer window):
        # deterministic victims from the PREVIOUS batch so they exist
        if args.deletes_every and (i + 1) % args.deletes_every == 0 and i:
            deleted.add((i - 1) * args.batch_docs)
            inc.delete_from_search_index(spark, idx, [(i - 1) * args.batch_docs])
        if args.revises_every and (i + 1) % args.revises_every == 0 and i:
            vid = (i - 1) * args.batch_docs + 1
            if vid not in deleted:
                inc.revise_search_document(
                    spark, idx, vid, f"merge revisedbody{vid} fresh words"
                )
                last_revised = vid
        if (i + 1) % args.every == 0:
            best = math.inf
            hits = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                hits = inc.bm25_over_index(spark, idx, TERMS, topn=10).collect()
                best = min(best, time.perf_counter() - t0)
            # correctness under operational load: no tombstoned id may rank
            bad = [r[0] for r in hits if r[0] in deleted]
            assert not bad, f"tombstoned ids in probe results: {bad}"
            # revised docs must rank under their NEW content (the nonce
            # body term retrieves the victim whether its revision is
            # pending in the sidecar or already absorbed into the main)
            if last_revised is not None:
                got = {
                    r[0]
                    for r in inc.bm25_over_index(
                        spark, idx, [f"revisedbody{last_revised}"], topn=3
                    ).collect()
                }
                assert last_revised in got, (
                    f"revised doc {last_revised} not retrievable by new "
                    f"content"
                )
            pt = {"batch": i + 1, "probe_wall": round(best, 3), **census(idx)}
            points.append(pt)
            print(
                f"# b={pt['batch']} probe={pt['probe_wall']}s "
                f"post_files={pt['postings_files']} "
                f"max_bucket={pt['max_bucket_files']} dl={pt['doclen_files']} "
                f"revmark={pt['revision_files']} fast={pt['fast_path']} "
                f"elapsed={time.perf_counter() - t_start:.0f}s",
                file=sys.stderr,
            )
    print(
        "| batch | probe wall (s) | postings files | max bucket | doclen "
        "files | tomb | revmark | revstore |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for pt in points:
        print(
            f"| {pt['batch']} | {pt['probe_wall']} | {pt['postings_files']} "
            f"| {pt['max_bucket_files']} | {pt['doclen_files']} "
            f"| {pt['tombstone_files']} | {pt['revision_files']} "
            f"| {pt['rev_store_files']} |"
        )
    if not points:  # smoke runs shorter than --every still report
        points = [{"batch": args.batches, "probe_wall": 0.0,
                   **census(idx)}]
    first, last = points[0], points[-1]
    print(json.dumps({
        "metric": "search_stream_soak",
        "mode": mode,
        "batches": args.batches,
        "batch_docs": args.batch_docs,
        "points": points,
        "probe_growth": (
            round(last["probe_wall"] / first["probe_wall"], 3)
            if first["probe_wall"]
            else None
        ),
        "files_growth": round(
            last["postings_files"] / max(1, first["postings_files"]), 3
        ),
    }))


if __name__ == "__main__":
    main()
