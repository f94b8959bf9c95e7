#!/usr/bin/env python
"""Replay of the bench drift gate against a deliberately LOADED window.

The round-13 driver snapshot (BENCH_r13.json, sentinel drift 1.397) landed
in a loaded VM window and manufactured a phantom 31% regression across the
persisted-store query family — files the round's diff never touched. This
tool demonstrates, deterministically and without Spark, that the round-14
gate RE-MEASURES such a window instead of emitting it:

- attempt 1 simulates the r13-style load profile: light queries inflated
  ~1.35x, store-backed queries inflated ~2.2x (I/O-heavy plans drift
  super-linearly under background I/O — the exact asymmetry the light-only
  sentinel median could not see);
- attempt 2 simulates the calm window the VM returns to;
- the gate flags attempt 1 (drift and spread both past the thresholds),
  triggers the re-run, and `_pick_calmest` emits attempt 2 — whose
  per-family normalized walls land within noise of the true calm walls.

Run: python tools/bench_gate_replay.py   (exit 0 = gate behaved)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    GATE_DRIFT,
    GATE_SPREAD,
    SENTINEL_REF_WALL,
    STORE_SENTINEL_REF_WALL,
    _is_calm,
    _normalized_block,
    _pick_calmest,
)

# A miniature catalog: the real light sentinels at their pinned calm walls
# plus three stand-in store-family queries (prepare-backed in the real
# catalog). Walls are the PINNED references, so the calm attempt sits at
# ratio ~1.0 by construction.
CALM_LIGHT = dict(SENTINEL_REF_WALL)
CALM_STORE_QUERIES = {
    "dedup_minhash_lsh": 0.88,
    "corpus_prep_stats": 1.82,
    "ann_ivf_topk": 1.04,
}
STORE_FAMILIES = set(CALM_STORE_QUERIES)
CALM_STORE_SENTINELS = dict(STORE_SENTINEL_REF_WALL)

LIGHT_LOAD = 1.35  # the r13 window's light-sentinel inflation
STORE_LOAD = 2.2  # its persisted-store inflation (1.5-2.25x observed)


def _attempt(light_mult: float, store_mult: float) -> dict:
    timings = {n: round(w * light_mult, 3) for n, w in CALM_LIGHT.items()}
    timings.update(
        {n: round(w * store_mult, 3) for n, w in CALM_STORE_QUERIES.items()}
    )
    store_walls = {
        n: round(w * store_mult, 3) for n, w in CALM_STORE_SENTINELS.items()
    }
    norm = _normalized_block(timings, store_walls, STORE_FAMILIES)
    return {
        "timings": timings,
        "total": round(sum(timings.values()), 3),
        "norm": norm,
    }


def main() -> int:
    loaded = _attempt(LIGHT_LOAD, STORE_LOAD)
    calm = _attempt(1.0, 1.0)

    ln, cn = loaded["norm"], calm["norm"]
    print(
        f"loaded attempt: drift={ln['drift']} light={ln['drift_light']} "
        f"store={ln['drift_store']} spread={ln['sentinel_spread']} "
        f"(gate: drift<={GATE_DRIFT}, spread<={GATE_SPREAD})"
    )
    print(
        f"calm attempt:   drift={cn['drift']} light={cn['drift_light']} "
        f"store={cn['drift_store']} spread={cn['sentinel_spread']}"
    )

    failures = []
    if _is_calm(ln):
        failures.append("gate FAILED to flag the loaded window")
    if not _is_calm(cn):
        failures.append("gate wrongly flagged the calm window")
    kept = _pick_calmest([loaded, calm])
    if kept != 1:
        failures.append(f"_pick_calmest kept attempt {kept + 1}, not calm")

    # Even if every attempt were loaded, the per-family correction must
    # recover the calm walls: the loaded attempt's normalized store-query
    # walls should match their true calm walls within rounding, because
    # the store sentinels saw the same 2.2x the store queries did. The
    # pre-round-14 light-only model would have divided by ~1.35 and
    # reported a phantom ~1.6x store-family "regression".
    for name, calm_wall in CALM_STORE_QUERIES.items():
        norm_wall = ln["queries"][name]
        if abs(norm_wall - calm_wall) / calm_wall > 0.02:
            failures.append(
                f"family correction missed: {name} normalized to "
                f"{norm_wall}, calm wall {calm_wall}"
            )
        old_model_wall = round(
            loaded["timings"][name] / ln["drift_light"], 3
        )
        print(
            f"  {name}: loaded raw {loaded['timings'][name]} -> "
            f"family-normalized {norm_wall} (calm {calm_wall}; "
            f"light-only model would report {old_model_wall})"
        )

    if failures:
        print(json.dumps({"replay": "FAIL", "failures": failures}))
        return 1
    print(json.dumps({"replay": "PASS", "kept_attempt": kept + 1}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
