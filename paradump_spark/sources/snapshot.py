"""S6 — true MySQL snapshot consistency: a pool of connections whose
``CONSISTENT SNAPSHOT`` transactions all observe the SAME binlog
position, obtained with the reference's flush-lock + overprovision +
position-vote protocol (ref src/paradump/paradump.go:100-355:
``MysqlLockTableWaitRelease`` / ``MysqlLockTableStartConsistenRead`` /
``GetaSynchronizedMysqlConnections``), re-expressed over DBAPI
connections and Python threads.

Protocol (same WHAT, Python HOW):

1. Open ``target_count x overprovision`` connections.  Connection 0 is
   the lock holder; the rest are snapshot candidates.
2. Every candidate preps its session (utf8mb4, UTC, REPEATABLE READ,
   long wait_timeout — ref :158-196) and parks at a barrier.
3. The lock holder takes ``FLUSH TABLES WITH READ LOCK`` and reads the
   master binlog position (ref :100-145).  Writes are now frozen.
4. All candidates run ``START TRANSACTION WITH CONSISTENT SNAPSHOT``
   and read their own ``SHOW MASTER STATUS`` (ref :210-238).
5. The lock holder releases the lock.  Positions are tallied; the
   first position claimed by >= ``target_count`` sessions wins and must
   equal the master position seen under the lock (ref :322-337 — any
   mismatch is a protocol failure, not a retry case).  Surplus and
   disagreeing sessions are closed.

The resulting pool powers :func:`synchronized_export`: table chunks
(from ``plans/split.plan_chunks``) are drained from a queue by one
thread per pooled connection, each chunk landing as its own parquet
file — a PARALLEL consistent export, vs ``single_tx_export``'s
serialized one.  Spark then reads the directory with full parallelism.

Why export-then-read instead of handing Spark executors the sessions:
a Spark JDBC partition opens its own connection on an executor, which
can never join a transaction that was started on the driver.  Snapshot
consistency therefore has to be established driver-side (or
source-side); the exported directory is the consistency boundary that
the cluster-parallel part of the job consumes.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from paradump_spark.plans.split import Chunk, chunk_predicates_sql
from paradump_spark.sources.jdbc import copy_cursor_to_parquet, quote_ident

# Session prep mirroring ref paradump.go:158-196 (NAMES, TIME_ZONE,
# isolation, wait_timeout) — REPEATABLE READ is what makes the later
# CONSISTENT SNAPSHOT transaction a stable read view.
MYSQL_SESSION_INIT: tuple[str, ...] = (
    "SET NAMES utf8mb4 COLLATE utf8mb4_general_ci",
    "SET TIME_ZONE='+00:00'",
    "SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ",
    "SET SESSION wait_timeout=86400",
)

FLUSH_LOCK_SQL = "FLUSH TABLES WITH READ LOCK"
UNLOCK_SQL = "UNLOCK TABLES"
START_SNAPSHOT_SQL = "START TRANSACTION WITH CONSISTENT SNAPSHOT"
# MySQL <= 8.3 spelling first; 8.4 renamed it (SHOW BINARY LOG STATUS).
MASTER_STATUS_SQLS: tuple[str, ...] = (
    "SHOW MASTER STATUS",
    "SHOW BINARY LOG STATUS",
)


@dataclass(frozen=True)
class BinlogPosition:
    """(file name, offset) — the coordinate every pooled session shares."""

    name: str
    pos: int


class SnapshotSyncError(RuntimeError):
    """The protocol could not seat ``target_count`` sessions on one
    binlog position (or the winning position disagreed with the
    master position read under the flush lock — ref :334-336)."""


@dataclass
class SnapshotPool:
    """``target_count`` open DBAPI connections, each inside a
    ``CONSISTENT SNAPSHOT`` transaction anchored at ``position``."""

    connections: list[Any]
    position: BinlogPosition
    candidates: int  # sessions opened by the protocol
    matched: int  # sessions that landed on the winning position

    def close(self) -> None:
        for conn in self.connections:
            try:
                conn.rollback()
            except Exception:
                pass
            try:
                conn.close()
            except Exception:
                pass
        self.connections = []


def _master_status(cur) -> BinlogPosition:
    last_err: Exception | None = None
    for sql in MASTER_STATUS_SQLS:
        try:
            cur.execute(sql)
            row = cur.fetchone()
        except Exception as ex:  # dialect/version fallback
            last_err = ex
            continue
        if row is None:
            raise SnapshotSyncError(
                "no binlog position: binary logging is disabled on the source"
            )
        return BinlogPosition(name=str(row[0]), pos=int(row[1]))
    raise SnapshotSyncError(f"cannot read master status: {last_err}")


def synchronized_mysql_sessions(
    connection_factory: Callable[[], Any],
    target_count: int,
    overprovision: int = 3,
    session_init: Sequence[str] = MYSQL_SESSION_INIT,
) -> SnapshotPool:
    """Seat ``target_count`` connections on one binlog position.

    ``overprovision`` opens ``target_count * overprovision`` total
    connections (ref opens TargetCount*3, :245-268): under the flush
    lock every session SHOULD observe the same position, so surplus is
    cheap insurance against stragglers, and the >= ``target_count``
    vote (ref :320-326) is the proof the insurance paid out.
    """
    if target_count < 1:
        raise ValueError("target_count must be >= 1")
    total = max(target_count * overprovision, target_count + 1)
    conns = [connection_factory() for _ in range(total)]
    n_workers = total - 1  # conns[0] holds the global lock

    ready = threading.Barrier(n_workers + 1)
    start = threading.Event()
    results: list[tuple[int, BinlogPosition | None, Exception | None]] = []
    results_lock = threading.Lock()

    def worker(idx: int) -> None:
        pos: BinlogPosition | None = None
        err: Exception | None = None
        try:
            cur = conns[idx].cursor()
            for sql in session_init:
                cur.execute(sql)
            ready.wait()
            start.wait()
            cur.execute(START_SNAPSHOT_SQL)
            pos = _master_status(cur)
        except Exception as ex:  # collected; protocol decides below
            err = ex
            try:
                ready.wait(timeout=0)  # unblock main if we died pre-barrier
            except Exception:
                pass
        with results_lock:
            results.append((idx, pos, err))

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(1, total)
    ]
    for t in threads:
        t.start()

    master_pos: BinlogPosition | None = None
    try:
        ready.wait()  # every candidate session is prepped
        lock_cur = conns[0].cursor()
        lock_cur.execute(FLUSH_LOCK_SQL)
        try:
            master_pos = _master_status(lock_cur)
            start.set()  # candidates start their snapshot transactions
            for t in threads:
                t.join()
        finally:
            lock_cur.execute(UNLOCK_SQL)
    except Exception:
        start.set()
        for conn in conns:
            try:
                conn.close()
            except Exception:
                pass
        raise

    # ---- tally (ref :305-337): first position with enough votes wins
    by_pos: dict[BinlogPosition, list[int]] = {}
    errors = [e for _, _, e in results if e is not None]
    for idx, pos, err in results:
        if err is None and pos is not None:
            by_pos.setdefault(pos, []).append(idx)

    winner: BinlogPosition | None = None
    for pos, idxs in by_pos.items():
        if len(idxs) >= target_count:
            winner = pos
            break

    def _close_all() -> None:
        for conn in conns:
            if conn is not None:
                try:
                    conn.close()
                except Exception:
                    pass

    if winner is None:
        _close_all()
        detail = "; ".join(
            f"{pos.name}@{pos.pos}: {len(idxs)} sessions"
            for pos, idxs in by_pos.items()
        )
        raise SnapshotSyncError(
            f"no binlog position reached {target_count} sessions "
            f"(positions seen: {detail or 'none'}; "
            f"{len(errors)} session errors: {errors[:3]})"
        )
    if master_pos is not None and winner != master_pos:
        _close_all()
        raise SnapshotSyncError(
            f"winning session position {winner.name}@{winner.pos} differs "
            f"from master position {master_pos.name}@{master_pos.pos} "
            "read under the flush lock"
        )

    keep = by_pos[winner][:target_count]
    pool_conns = []
    for idx in keep:
        pool_conns.append(conns[idx])
        conns[idx] = None
    matched = len(by_pos[winner])
    _close_all()  # lock holder + surplus + disagreeing sessions
    return SnapshotPool(
        connections=pool_conns,
        position=winner,
        candidates=total,
        matched=matched,
    )


def synchronized_export(
    pool: SnapshotPool,
    table: str,
    out_dir: str,
    chunks: Sequence[Chunk],
    pk_cols: Sequence[str],
    columns: Sequence[str] | None = None,
    batch_rows: int = 50_000,
    dialect: str = "mysql",
) -> int:
    """Parallel consistent export: each pooled session drains table
    chunks from a shared queue, writing one parquet file per chunk under
    ``out_dir``.  All sessions share one binlog position, so the union
    of the chunk files is a true point-in-time snapshot — the parallel
    upgrade of ``single_tx_export`` (which serializes the whole table
    through one transaction).

    One thread per connection (DBAPI connections are not concurrently
    shareable); within a thread chunks run serially, exactly the
    reference's N-goroutines-N-connections shape (paradump.go:1844-1979)
    — except Spark, not this process, does all downstream compute.
    Returns total rows exported.
    """
    os.makedirs(out_dir, exist_ok=True)
    quote = "`" if dialect == "mysql" else '"'
    preds = chunk_predicates_sql(list(chunks), list(pk_cols), quote)
    cols = ", ".join(quote_ident(c, dialect) for c in columns) if columns else "*"
    tbl = ".".join(quote_ident(p, dialect) for p in table.split("."))

    work: queue.Queue[tuple[int, str]] = queue.Queue()
    for i, pred in enumerate(preds):
        work.put((i, pred))

    totals = [0] * len(pool.connections)
    failures: list[Exception] = []
    fail_lock = threading.Lock()

    def drain(slot: int, conn) -> None:
        try:
            cur = conn.cursor()
            while True:
                try:
                    i, pred = work.get_nowait()
                except queue.Empty:
                    return
                cur.execute(f"SELECT {cols} FROM {tbl} WHERE {pred}")
                out = os.path.join(out_dir, f"part-{i:05d}.parquet")
                totals[slot] += copy_cursor_to_parquet(cur, out, batch_rows)
        except Exception as ex:
            with fail_lock:
                failures.append(ex)

    threads = [
        threading.Thread(target=drain, args=(slot, conn), daemon=True)
        for slot, conn in enumerate(pool.connections)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if failures:
        raise failures[0]
    return sum(totals)
