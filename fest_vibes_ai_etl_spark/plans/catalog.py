"""Declared query catalog.

Every operator capability from SURVEY §2 is declared here as a named
``QuerySpec``: a Spark DataFrame plan plus (where SQL-expressible) the exact
ANSI-SQL oracle DuckDB runs on the same parquet tables. The driver's
correctness harness compares row counts + schema + order-insensitive value
hashes, so:

- every computed column is explicitly aliased identically on both sides;
- floating-point aggregates are rounded identically on both sides;
- emitted timestamps are truncated to seconds on both sides (the synthetic
  ``events.ts`` carries sub-microsecond nanos that Spark truncates to µs but
  DuckDB preserves);
- integer aggregates are width-pinned: DuckDB types SUM-of-integer as
  HUGEINT (int128), which its pandas bridge renders as float64 and breaks
  the value hash — every oracle SUM over an integer expression must be
  ``CAST(SUM(...) AS BIGINT)``;
- rows-only (no-oracle) queries must not emit raw array/map/struct columns:
  the driver's canonicalizer sorts a pandas frame and dies on unhashable
  cells — ``to_json`` them in the catalog projection.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False
    doc: str = ""
    # One-off amortized build step (e.g. persisting an IVF index) run by
    # bench.py during warmup at the TARGET sf_dir, so the timed run measures
    # the steady-state query (probe) — the deployment cost model — not the
    # index build. Correctness runs execute fn directly; fn must therefore
    # invoke the same build lazily (load-or-build) when the artifact is absent.
    prepare: Callable[[SparkSession, str], None] | None = None
    # eval_only: measured-metric queries (IVF recall, HLL rollup error) whose
    # VALUES are data/quantizer-dependent and not SQL-expressible — they stay
    # registered (pytest asserts their documented floors via REGISTRY) but are
    # excluded from the driver-facing queries() catalog, where an oracle-less
    # entry would be indistinguishable from a broken query.
    eval_only: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             bench: bool = False, doc: str = "",
             prepare: Callable[[SparkSession, str], None] | None = None,
             eval_only: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags,
                                   bench=bench, doc=doc or (fn.__doc__ or ""),
                                   prepare=prepare, eval_only=eval_only)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {
        name: spec.fn for name, spec in REGISTRY.items() if not spec.eval_only
    }


def oracle_sql() -> dict[str, str]:
    _load()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, QuerySpec]:
    _load()
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


_loaded = False


def _load() -> None:
    """Populate REGISTRY (import side-effect of the plan modules)."""
    global _loaded
    if not _loaded:
        from . import (  # noqa: F401
            analytics,
            behavior,
            corpus,
            dq,
            erq,
            extended,
            funnel,
            geoq,
            graph,
            pipelineq,
            relational,
            retrievalq,
            samplingq,
            scalar_extra,
            searchq,
            sessions,
            sketches,
            skewq,
            snapshots,
            sqlsurface,
            temporalq,
            textmining,
            topkq,
            bloomq,
            cogroupq,
            statsq,
            tpch_extra,
            tpch_more,
            trainprep,
            udtfq,
            variantq,
            vectorml,
            zorderq,
        )
        _loaded = True
