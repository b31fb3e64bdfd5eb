"""Production keyed-upsert sink: ``foreachBatch`` → SQL MERGE/UPSERT
(SURVEY.md §2.A S9-S11 production path).

In tests/bench the engine materializes state via the relational merge
(operators/upsert.py, streaming/state.py). Against a real PostgreSQL
the same micro-batch becomes ``INSERT … ON CONFLICT (keys) DO UPDATE``
statements executed per partition on the executors — never a
driver-side collect loop. Statement shape mirrors the reference
(etl/jobs/fetch_market_data/fetch_market_data.py:36-56 and siblings);
the DB driver is injected (``connection_factory``) so no database or
client library is required here, and per-micro-batch transactions +
idempotent conflict handling reproduce the reference's
commit/rollback semantics (fetch_market_index_data.py:99-107, ST2).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator


def upsert_sql(
    table: str, columns: list[str], keys: list[str], placeholder: str = "%s"
) -> str:
    """The reference's upsert statement, parameterized
    (reference: etl/jobs/fetch_market_data/fetch_market_data.py:36-46).
    ``placeholder`` is the paramstyle token: ``%s`` for psycopg
    (reference), ``?`` for qmark drivers (DuckDB/SQLite), letting the
    integration test execute the same statement against a real store."""
    cols = ", ".join(columns)
    placeholders = ", ".join([placeholder] * len(columns))
    conflict = ", ".join(keys)
    updates = ", ".join(
        f"{c} = EXCLUDED.{c}" for c in columns if c not in keys
    )
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({placeholders}) "
        f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
    )


class PartitionUpserter:
    """Per-partition writer: one connection, one transaction — commit
    on success, rollback on error (reference semantics:
    fetch_market_index_data.py:99-107). A picklable callable so Spark
    ships it to executors."""

    def __init__(
        self,
        table: str,
        columns: list[str],
        keys: list[str],
        connection_factory: Callable[[], Any],
        batch_size: int = 1000,
        placeholder: str = "%s",
    ) -> None:
        self.sql = upsert_sql(table, columns, keys, placeholder)
        self.columns = columns
        self.connection_factory = connection_factory
        self.batch_size = batch_size

    def __call__(self, rows: Iterator) -> None:
        conn = self.connection_factory()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            for row in rows:
                buf.append(tuple(row[c] for c in self.columns))
                if len(buf) >= self.batch_size:
                    cur.executemany(self.sql, buf)
                    buf = []
            if buf:
                cur.executemany(self.sql, buf)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()


def foreach_batch_upsert(
    table: str,
    columns: list[str],
    keys: list[str],
    connection_factory: Callable[[], Any],
    batch_size: int = 1000,
) -> Callable:
    """Build a ``foreachBatch`` function that upserts each micro-batch,
    executing per PARTITION on the executors — never a driver-side
    collect loop. Safe under Spark task retries because the statement
    is idempotent on the conflict keys (ST2)."""
    writer = PartitionUpserter(table, columns, keys, connection_factory, batch_size)

    def handle(batch_df, batch_id: int) -> None:
        batch_df.select(*columns).foreachPartition(writer)

    return handle
