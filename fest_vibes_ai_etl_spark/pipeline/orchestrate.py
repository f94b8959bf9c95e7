"""Control-flow orchestration for the pipeline (SURVEY §2.10).

The reference drives its daily run with a Step Function: a Map state fans
out over dates with MaxConcurrency=5 (O1), Choice states gate each stage on
status codes (O2), infra retries use exponential backoff (O3), the loader
retries deadlocked batches app-side with backoff+jitter (O4,
``src/loader/service.py:862-902``), and batches continue past failures
(O5, ``service.py:1081-1105``).

Under Spark most of that machinery dissolves — dates are partitions of one
DataFrame, task retries are ``spark.task.maxFailures``, and deadlock
retries are moot because writes are deterministic partition overwrites.
What REMAINS meaningful app-side, and what this module provides:

- **Stage gates (O2):** each stage's output is checked against explicit
  invariants (non-empty, bounded quarantine ratio) before the next stage
  consumes it; a failed gate raises ``StageGateError`` with the stage name
  and measured value — the Spark-app analog of a Choice → Fail state.
- **Per-date backfill with retry + continue-on-failure (O3/O4/O5):** a
  multi-day backfill loop that processes dates in batches, retries a failed
  date with capped exponential backoff (deterministic, seeded by attempt —
  reproducible runs), quarantines dates that exhaust retries, and keeps
  going. Writes are idempotent (partition overwrite keyed by date), so a
  retried date can never double-write (the reference needs row-level
  rollback for this; we get it from the storage layout).
- **Topological stage order (O6):** ``run_gated_pipeline`` materializes
  dims before facts before bridges — the deadlock-avoidance ordering the
  reference enforces with a genre pre-seed phase, free of locks here.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .driver import run_pipeline


class StageGateError(RuntimeError):
    """A stage invariant failed (the Choice → Fail transition)."""

    def __init__(self, stage: str, check: str, value: object):
        super().__init__(f"stage gate failed: {stage}: {check} (measured {value!r})")
        self.stage, self.check, self.value = stage, check, value


@dataclass
class StageReport:
    stage: str
    rows: int
    checks: list[str] = field(default_factory=list)


def gate_nonempty(stage: str, df: DataFrame, *, min_rows: int = 1) -> int:
    n = df.count()
    if n < min_rows:
        raise StageGateError(stage, f"rows >= {min_rows}", n)
    return n


def gate_ratio(stage: str, num: int, denom: int, *, max_ratio: float, check: str) -> float:
    ratio = (num / denom) if denom else 1.0
    if ratio > max_ratio:
        raise StageGateError(stage, f"{check} <= {max_ratio}", round(ratio, 4))
    return ratio


def run_gated_pipeline(
    spark: SparkSession,
    bronze: DataFrame,
    dates: list[str],
    *,
    max_quarantine_ratio: float = 0.5,
    with_embeddings: bool = True,
) -> tuple[dict[str, DataFrame], list[StageReport]]:
    """The §3.1 pipeline with O2 gates between stages.

    Checks mirror the reference's Choice states: bronze must be non-empty,
    the quarantine ratio must stay under ``max_quarantine_ratio``, and each
    silver layer must be non-empty before gold is attempted."""
    reports: list[StageReport] = []

    n_bronze = gate_nonempty("bronze", bronze)
    reports.append(StageReport("bronze", n_bronze, ["nonempty"]))

    layers = run_pipeline(spark, bronze, dates, with_embeddings=with_embeddings)

    n_quar = layers["quarantine"].count()
    gate_ratio(
        "validate", n_quar, n_bronze,
        max_ratio=max_quarantine_ratio, check="quarantine_ratio",
    )
    reports.append(StageReport("quarantine", n_quar, ["quarantine_ratio"]))

    # O6: dims before fact before bridges — materialization order is the
    # dependency order, checked non-empty in sequence.
    for stage in ("genres", "artists", "venues", "events"):
        n = gate_nonempty(stage, layers[stage])
        reports.append(StageReport(stage, n, ["nonempty"]))

    n_gold = gate_nonempty("cache_payload", layers["cache_payload"])
    reports.append(StageReport("cache_payload", n_gold, ["nonempty"]))
    return layers, reports


@dataclass
class DateRunResult:
    date: str
    status: str  # "ok" | "failed"
    attempts: int
    rows: int = 0
    error: str | None = None


def backoff_seconds(attempt: int, *, base: float = 0.1, cap: float = 2.0) -> float:
    """Deterministic capped exponential backoff: base·2ⁿ, no jitter.

    The reference adds random jitter to decorrelate DB lock retries
    (``service.py:880``); Spark stage re-runs have no lock contention to
    decorrelate, and determinism keeps backfills reproducible."""
    return min(cap, base * (2 ** attempt))


def backfill_dates(
    process_date: Callable[[str], int],
    dates: Iterable[str],
    *,
    max_attempts: int = 3,
    sleep: Callable[[float], None] = time.sleep,
) -> list[DateRunResult]:
    """O1/O3/O4/O5: multi-day backfill loop with per-date retry and
    continue-on-failure.

    ``process_date`` runs one date end-to-end and returns a row count; it
    must be idempotent (write via partition overwrite / merge_store), which
    makes retry-after-partial-failure safe with no rollback machinery.
    Dates that exhaust ``max_attempts`` are reported ``failed`` and the
    loop CONTINUES — the O5 semantic: one bad date never aborts a backfill.
    """
    results: list[DateRunResult] = []
    for d in dates:
        last_err: str | None = None
        for attempt in range(max_attempts):
            try:
                rows = process_date(d)
                results.append(DateRunResult(d, "ok", attempt + 1, rows))
                break
            except StageGateError as exc:
                # Gate failures are data problems, not transients: no retry.
                results.append(DateRunResult(d, "failed", attempt + 1, error=str(exc)))
                break
            except Exception as exc:  # noqa: BLE001 — transient boundary
                last_err = f"{type(exc).__name__}: {exc}"
                if attempt + 1 < max_attempts:
                    sleep(backoff_seconds(attempt))
        else:
            results.append(DateRunResult(d, "failed", max_attempts, error=last_err))
    return results
