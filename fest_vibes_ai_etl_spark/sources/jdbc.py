"""JDBC relational source/sink — the Postgres migration path.

The reference's warehouse IS PostgreSQL: SQLAlchemy models plus
``ON CONFLICT`` upserts managed in ``src/shared/db/database.py:131-218``
and ``src/loader/service.py`` (reference repo). This engine standardizes on
parquet for the lakehouse, but a user migrating FROM the reference needs
two JDBC shapes (MIGRATION.md narrates both; this module implements them):

1. **Partitioned read** of an existing Postgres table — Spark's built-in
   JDBC source with explicit stride parallelism, so a 10⁹-row table arrives
   as N concurrent range scans instead of one connection's full-table cursor.
2. **Upsert write** — Spark's JDBC writer has only append/overwrite, no
   MERGE, so the scalable upsert is the classic two-phase shape: stage the
   DataFrame into a temp table with the parallel JDBC writer, then execute
   ONE set-based ``INSERT ... SELECT ... ON CONFLICT (keys) DO UPDATE``
   server-side — the same statement family the reference issues per-batch,
   but issued once over the staged set (no per-row round trips, no
   deadlock-retry dance because a single statement takes its locks in one
   deterministic order).

No Postgres (or JDBC driver jar) ships in this sandbox, so the DB-touching
calls degrade loudly (clear error naming the missing piece); the SQL
generation and option construction — the parts that encode the semantics —
are pure functions with direct tests (tests/test_formats.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Spark JDBC reader options with stride parallelism. With a numeric
    ``partition_column`` + bounds, Spark issues ``num_partitions`` range
    predicates (one connection each); without, the read is single-stream
    (fine for dims, wrong for facts — callers should pass the PK)."""
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
        # Catalyst pushes filters/column pruning into the generated SQL by
        # default; keep aggregate pushdown on for count/min/max probes.
        "pushDownAggregate": "true",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound/upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc_table(spark: SparkSession, **options) -> DataFrame:
    """``spark.read.format('jdbc')`` with :func:`jdbc_read_options` output."""
    return spark.read.format("jdbc").options(**jdbc_read_options(**options)).load()


def _q(ident: str) -> str:
    """Quote a SQL identifier (Postgres double-quote, doubled internals)."""
    return '"' + ident.replace('"', '""') + '"'


# NOTE: table/staging identifiers below are TRUSTED caller input (pipeline
# config, not user data) — only column names are identifier-quoted. Values
# never appear in the generated SQL: the staged write parameterizes rows.
def upsert_sql(
    table: str,
    columns: Sequence[str],
    keys: Sequence[str],
    staging_table: str,
    update_cols: Sequence[str] | None = None,
    coalesce_cols: Sequence[str] = (),
) -> str:
    """The set-based Postgres upsert the staged write executes.

    - ``update_cols`` (default: every non-key column) are overwritten from
      the staged row (the reference's standard upsert);
    - ``coalesce_cols`` keep the existing value when the staged one is NULL
      (``COALESCE(EXCLUDED.c, t.c)``) — merge_coalesce semantics
      (operators/merge.py) pushed server-side.
    """
    keyset = set(keys)
    if update_cols is None:
        update_cols = [c for c in columns if c not in keyset]
    bad = [c for c in coalesce_cols if c in keyset or c not in columns]
    if bad:
        raise ValueError(f"coalesce_cols not updatable columns: {bad}")
    collist = ", ".join(_q(c) for c in columns)
    conflict = ", ".join(_q(k) for k in keys)
    sets = []
    for c in update_cols:
        if c in coalesce_cols:
            sets.append(f"{_q(c)} = COALESCE(EXCLUDED.{_q(c)}, {table}.{_q(c)})")
        else:
            sets.append(f"{_q(c)} = EXCLUDED.{_q(c)}")
    action = f"DO UPDATE SET {', '.join(sets)}" if sets else "DO NOTHING"
    return (
        f"INSERT INTO {table} ({collist}) "
        f"SELECT {collist} FROM {staging_table} "
        f"ON CONFLICT ({conflict}) {action}"
    )


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    staging_table: str | None = None,
    update_cols: Sequence[str] | None = None,
    coalesce_cols: Sequence[str] = (),
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> str:
    """Two-phase upsert: parallel JDBC append into ``staging_table``
    (truncated first), then one server-side ``ON CONFLICT`` statement
    merging it into ``table``. Returns the merge SQL it executed (or would
    execute), so callers/tests can audit it.

    Raises a clear RuntimeError when no JDBC driver is reachable — this
    sandbox has neither Postgres nor the driver jar; the function is the
    deployment seam, the SQL generator above is the tested contract."""
    staging = staging_table or f"{table}_stage"
    sql = upsert_sql(
        table, df.columns, keys, staging,
        update_cols=update_cols, coalesce_cols=coalesce_cols,
    )
    props = {"batchsize": str(batch_size), **(properties or {})}
    try:
        (
            df.write.format("jdbc")
            .options(url=url, dbtable=staging, truncate="true", **props)
            .mode("overwrite")
            .save()
        )
        jvm = df.sparkSession._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            stmt.executeUpdate(sql)
            stmt.close()
        finally:
            conn.close()
    except Exception as exc:  # driver jar / server absent
        raise RuntimeError(
            f"JDBC upsert needs a reachable database and driver on the "
            f"Spark classpath (spark.jars with the Postgres JDBC driver). "
            f"Planned merge statement: {sql}"
        ) from exc
    return sql
