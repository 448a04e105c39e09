"""JDBC upsert sink (reference S7: ``upsert_dataframe_to_postgres``,
``/root/reference/src/s3_to_rds_lambda.py:69-85`` — ``INSERT ... ON CONFLICT
(key) DO UPDATE SET col = EXCLUDED.col`` over all rows in one transaction).

Spark has no built-in JDBC merge, so the engine ships two strategies; both
are idempotent by key (applying the same batch twice leaves the same table
state — the property that makes at-least-once triggering effectively-once,
SURVEY.md §2.11):

1. ``upsert_via_staging`` — the 100 TB path.  The DataFrame is written to a
   staging table with Spark's distributed JDBC writer (parallel, batched),
   then ONE set-based ``MERGE INTO`` runs inside the database.  The merge
   is a single transaction over indexed keys; total data movement is the
   same as a plain append, and the database does what databases are good at.
2. ``upsert_via_foreach_partition`` — the reference-shaped path.  Each
   executor partition opens its own DB-API connection and executes batched
   ``INSERT ... ON CONFLICT`` statements in a per-partition transaction —
   ``df.foreachPartition`` + ``executemany``, exactly the reference's
   statement, but per-partition instead of whole-dataset-on-one-thread.
   The connection factory is injected (psycopg2 in production, sqlite3 in
   tests) so the sink is testable without a Postgres server.

Retry semantics: a partition that fails rolls back its own transaction;
Spark retries the task; the replayed ``ON CONFLICT`` batch converges to the
same rows.  No cross-partition transaction is attempted — global atomicity
comes from the staging+MERGE strategy instead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, Row


def _q(ident: str) -> str:
    """Quote an identifier (standard double quotes).  Spark's JDBC writer
    quotes the column names it creates, so the staging table's identifiers
    are case-sensitive — the merge must quote to match (Derby would
    otherwise fold ``s.name`` to ``S.NAME`` and miss)."""
    return '"' + ident.replace('"', '""') + '"'


def merge_sql(
    table: str, staging: str, key_cols: list[str], value_cols: list[str]
) -> str:
    """ANSI ``MERGE INTO`` from a staging table (Derby/Postgres 15+/most)."""
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in value_cols)
    cols = ", ".join(_q(c) for c in key_cols + value_cols)
    vals = ", ".join(f"s.{_q(c)}" for c in key_cols + value_cols)
    return (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def on_conflict_sql(table: str, key_cols: list[str], value_cols: list[str]) -> str:
    """Postgres/SQLite ``INSERT ... ON CONFLICT`` with qmark placeholders —
    the reference's statement (s3_to_rds_lambda.py:74-79) parameterized."""
    cols = key_cols + value_cols
    placeholders = ", ".join("?" for _ in cols)
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in value_cols)
    return (
        f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
        f"ON CONFLICT ({', '.join(key_cols)}) DO UPDATE SET {sets}"
    )


def upsert_via_staging(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    staging_table: str | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Distributed staging write + one driver-issued ``MERGE INTO``.

    The staging write uses Spark's JDBC writer (every partition streams its
    rows in parallel with JDBC batch inserts); the merge then runs as a
    single set-based statement in the target database.  This is the scale
    path: no per-row Python, no driver materialization, one transaction
    for the merge itself.
    """
    staging = staging_table or f"{table}_staging"
    value_cols = [c for c in df.columns if c not in key_cols]

    writer = df.write.mode("overwrite").format("jdbc").option("url", url).option(
        "dbtable", staging
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()

    # Driver-side merge through the JVM's DriverManager (same classpath the
    # JDBC writer used — no Python DB driver needed).  ``properties`` (the
    # standard carrier for user/password) must reach this connection too,
    # not just the staging write, or the merge fails against any
    # authenticated database (round-2 advisory).
    jvm = df.sparkSession._jvm
    jprops = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(merge_sql(table, staging, key_cols, value_cols))
        finally:
            stmt.close()
    finally:
        conn.close()


def upsert_via_foreach_partition(
    df: DataFrame,
    connection_factory: Callable[[], Any],
    table: str,
    key_cols: list[str],
    batch_size: int = 1000,
) -> None:
    """Executor-side batched ``INSERT ... ON CONFLICT`` upsert.

    ``connection_factory`` must be a picklable zero-arg callable returning a
    DB-API connection (e.g. ``functools.partial(psycopg2.connect, dsn)`` or
    ``functools.partial(sqlite3.connect, path)``).  Each partition runs one
    transaction; batches of ``batch_size`` rows go through ``executemany``.
    Idempotent: replaying a partition converges to identical table state.
    """
    value_cols = [c for c in df.columns if c not in key_cols]
    cols = key_cols + value_cols
    sql = on_conflict_sql(table, key_cols, value_cols)

    def write_partition(rows: Iterator[Row]) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []

            def flush(b: Iterable[tuple]) -> None:
                cur.executemany(sql, list(b))

            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    flush(batch)
                    batch = []
            if batch:
                flush(batch)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(write_partition)


def ledgered_batch_sink(
    connection_factory: Callable[[], Any],
    table: str,
    key_cols: list[str],
    ledger_table: str = "__batch_ledger",
) -> Callable[[DataFrame, int], None]:
    """Exactly-once-effect ``foreachBatch`` sink via a batch-id ledger.

    The keyed upsert alone makes *row* replays converge, but a replayed
    micro-batch still re-executes its writes (and any side effects).  The
    ledger closes that gap: each batch id is recorded in ``ledger_table``
    in the SAME transaction scope as the data; a replayed batch id is
    detected and skipped entirely.  This is the standard
    idempotent-foreachBatch recipe for Structured Streaming sinks whose
    target database can hold a one-column ledger.

    Returns a ``(batch_df, batch_id) -> None`` callable for
    ``run_available_now`` / ``writeStream.foreachBatch``.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        con = connection_factory()
        try:
            cur = con.cursor()
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {_q(ledger_table)} (batch_id BIGINT PRIMARY KEY)"
            )
            con.commit()
            cur.execute(
                f"SELECT 1 FROM {_q(ledger_table)} WHERE batch_id = ?", (batch_id,)
            )
            if cur.fetchone() is not None:
                return  # replayed batch: already applied, skip all effects
        finally:
            con.close()

        upsert_via_foreach_partition(batch_df, connection_factory, table, key_cols)

        con = connection_factory()
        try:
            con.cursor().execute(
                f"INSERT INTO {_q(ledger_table)} (batch_id) VALUES (?)", (batch_id,)
            )
            con.commit()
        finally:
            con.close()

    return sink
