"""Orchestration layer (SURVEY §2.10): stage gates, retry backfill,
continue-on-failure."""

from __future__ import annotations

import pytest

from fest_vibes_ai_etl_spark.pipeline import orchestrate
from fest_vibes_ai_etl_spark.pipeline.fixtures import bronze_fixture
from fest_vibes_ai_etl_spark.pipeline.orchestrate import (
    DateRunResult,
    StageGateError,
    backfill_dates,
    backoff_seconds,
    run_gated_pipeline,
)


def test_gated_pipeline_passes_on_fixture(spark):
    layers, reports = run_gated_pipeline(
        spark,
        bronze_fixture(spark),
        dates=["2025-03-01", "2025-03-02"],
        with_embeddings=False,
    )
    stages = [r.stage for r in reports]
    # O6: dims materialize (and gate) before the fact, fact before gold.
    assert stages.index("genres") < stages.index("events") < stages.index("cache_payload")
    assert all(r.rows >= 1 for r in reports if r.stage != "quarantine")
    assert layers["cache_payload"].count() >= 1


def test_gate_fails_on_empty_bronze(spark):
    empty = bronze_fixture(spark).limit(0)
    with pytest.raises(StageGateError) as exc:
        run_gated_pipeline(spark, empty, dates=["2025-03-01"], with_embeddings=False)
    assert exc.value.stage == "bronze"


def test_gate_fails_on_quarantine_ratio(spark):
    bronze = bronze_fixture(spark)
    with pytest.raises(StageGateError) as exc:
        run_gated_pipeline(
            spark, bronze, dates=["2025-03-01"],
            max_quarantine_ratio=0.01, with_embeddings=False,
        )
    assert exc.value.stage == "validate"
    assert exc.value.value > 0.01


def test_backoff_is_capped_exponential():
    assert backoff_seconds(0) == pytest.approx(0.1)
    assert backoff_seconds(1) == pytest.approx(0.2)
    assert backoff_seconds(10) == pytest.approx(2.0)  # cap


def test_backfill_retries_transient_and_continues_past_failures():
    attempts: dict[str, int] = {}
    slept: list[float] = []

    def process(date: str) -> int:
        attempts[date] = attempts.get(date, 0) + 1
        if date == "d2" and attempts[date] < 3:
            raise TimeoutError("transient")
        if date == "d3":
            raise ValueError("permanent")
        return 10

    results = backfill_dates(
        process, ["d1", "d2", "d3", "d4"], max_attempts=3, sleep=slept.append
    )
    by_date = {r.date: r for r in results}
    assert by_date["d1"] == DateRunResult("d1", "ok", 1, 10)
    assert by_date["d2"].status == "ok" and by_date["d2"].attempts == 3
    assert by_date["d3"].status == "failed" and "permanent" in by_date["d3"].error
    # O5: d4 still ran after d3 exhausted its retries.
    assert by_date["d4"].status == "ok"
    # O3/O4: deterministic capped exponential backoff between d2's attempts.
    assert slept[:2] == [pytest.approx(0.1), pytest.approx(0.2)]


def test_backfill_gate_failures_do_not_retry():
    calls: list[str] = []

    def process(date: str) -> int:
        calls.append(date)
        raise StageGateError("validate", "quarantine_ratio <= 0.5", 0.9)

    results = backfill_dates(process, ["d1"], max_attempts=3, sleep=lambda _: None)
    assert results[0].status == "failed" and results[0].attempts == 1
    assert calls == ["d1"]  # data problems are not transient: exactly one try


def test_module_doc_cites_reference():
    assert "service.py" in orchestrate.__doc__


def test_observation_metrics_piggyback_on_write(spark, tmp_path):
    from pyspark.sql import functions as F

    from fest_vibes_ai_etl_spark.pipeline.metrics import with_row_observer

    df = spark.range(100).withColumn("flag", F.col("id") % 4 == 0)
    observed, obs = with_row_observer(
        df, "probe", F.sum(F.col("flag").cast("int")).alias("n_flagged")
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = obs.get
    assert got["rows"] == 100 and got["n_flagged"] == 25
