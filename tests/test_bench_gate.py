"""Drift-gate + per-family normalization model in bench.py (pure logic —
no Spark). The round-13 driver snapshot landed in a loaded VM window and
manufactured a phantom 31% regression over the persisted-store family;
these tests pin the mechanics that prevent a recurrence: the gate flags
loaded windows, the calmest attempt wins, and the store-sentinel drift
corrects store-family queries the light sentinels cannot see."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (
    GATE_DRIFT,
    GATE_SPREAD,
    SENTINEL_REF_WALL,
    STORE_SENTINEL_REF_WALL,
    _is_calm,
    _normalized_block,
    _pick_calmest,
)


def _walls(light_mult=1.0, store_mult=1.0, store_queries=None):
    timings = {n: w * light_mult for n, w in SENTINEL_REF_WALL.items()}
    for name, wall in (store_queries or {}).items():
        timings[name] = wall * store_mult
    store_walls = {
        n: w * store_mult for n, w in STORE_SENTINEL_REF_WALL.items()
    }
    return timings, store_walls


def test_calm_window_passes_gate():
    timings, store_walls = _walls()
    norm = _normalized_block(timings, store_walls, set())
    assert norm is not None
    assert norm["drift"] == 1.0
    assert norm["drift_light"] == 1.0
    assert norm["drift_store"] == 1.0
    assert _is_calm(norm)


def test_uniformly_loaded_window_fails_gate():
    timings, store_walls = _walls(light_mult=1.4, store_mult=1.4)
    norm = _normalized_block(timings, store_walls, set())
    assert norm["drift"] > GATE_DRIFT
    assert not _is_calm(norm)


def test_io_asymmetric_load_fails_gate_via_spread():
    # light sentinels barely inside the drift gate, store sentinels
    # inflated — the pre-round-14 model (light median only) would have
    # called this calm and smeared the store load over nothing
    timings, store_walls = _walls(light_mult=1.05, store_mult=1.9)
    norm = _normalized_block(timings, store_walls, set())
    assert norm["sentinel_spread"] > GATE_SPREAD
    assert not _is_calm(norm)


def test_family_normalization_divides_by_own_family():
    store_q = {"dedup_x": 2.0, "corpus_y": 1.0}
    timings, store_walls = _walls(
        light_mult=1.2, store_mult=2.0, store_queries=store_q
    )
    norm = _normalized_block(timings, store_walls, set(store_q))
    assert norm["drift_light"] == 1.2
    assert norm["drift_store"] == 2.0
    # store queries recover their calm walls through the STORE drift
    assert abs(norm["queries"]["dedup_x"] - 2.0) < 0.01
    assert abs(norm["queries"]["corpus_y"] - 1.0) < 0.01
    # light queries recover theirs through the light drift
    assert (
        abs(
            norm["queries"]["q1_pricing_summary"]
            - SENTINEL_REF_WALL["q1_pricing_summary"]
        )
        < 0.01
    )
    # value is the sum of the per-family-normalized walls
    assert abs(norm["value"] - sum(norm["queries"].values())) < 0.05


def test_fallback_without_store_sentinels_is_light_model():
    store_q = {"dedup_x": 2.0}
    timings, _ = _walls(light_mult=1.5, store_queries=store_q)
    timings["dedup_x"] = 3.0
    norm = _normalized_block(timings, None, {"dedup_x"})
    assert norm["drift_store"] is None
    # no store sentinels -> the store query divides by the light drift
    assert abs(norm["queries"]["dedup_x"] - 2.0) < 0.01


def test_pick_calmest_prefers_lowest_drift():
    def att(drift, spread):
        return {
            "norm": {"drift": drift, "sentinel_spread": spread},
            "total": 1.0,
        }

    assert _pick_calmest([att(1.4, 1.5), att(1.05, 1.1), att(1.2, 1.3)]) == 1
    # an attempt with no normalized block loses to any measured one
    assert _pick_calmest([{"norm": None, "total": 1.0}, att(1.9, 2.5)]) == 1
    assert _is_calm(None)  # nothing to gate on: emit what we have
    # a gate-PASSING attempt beats a failing one even at higher drift
    # (the failing one's lower drift came with a disqualifying spread)
    assert _pick_calmest([att(1.04, 1.36), att(1.07, 1.29)]) == 1


def test_too_few_sentinels_returns_none():
    few = dict(list(SENTINEL_REF_WALL.items())[:3])
    assert _normalized_block(few, None, set()) is None


def test_contract_line_format_carries_queries_map():
    """VERDICT r14 #2/#8: the emitted stdout line must parse as ONE JSON
    object with metric/value/unit/queries/sf — the r13 artifact dropped the
    per-query map for line length and darkened a full round of PERF
    round-over-round comparison. Pin the format with a realistic payload:
    every current bench query name at a worst-case 3-digit wall."""
    import json

    from bench import contract_line
    from fest_vibes_ai_etl_spark.plans.catalog import bench_queries

    timings = {name: 99.999 for name in bench_queries()}
    out = {
        "metric": "catalog_bench_total_wall",
        "value": round(sum(timings.values()), 3),
        "queries": timings,
        "sf": 0.1,
        "kept_attempt": 3,
    }
    norm = {
        "drift": 1.184, "drift_light": 1.191, "drift_store": 1.177,
        "value": 35.232, "unit": "sec", "sentinel_spread": 1.586,
        "drift_model_suspect": False,
    }
    text = contract_line(out, {"some_query": "Boom: failed"}, norm)
    assert "\n" not in text
    assert len(text) < 1950
    parsed = json.loads(text)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key
    assert parsed["unit"] == "sec"
    assert parsed["queries"] == timings
    assert parsed["n_errors"] == 1
    assert parsed["normalized"]["drift"] == 1.184
    # the no-errors / no-norm shape parses too
    lean = json.loads(contract_line(out, {}, None))
    assert "n_errors" not in lean and "normalized" not in lean
