"""S6 — binlog-position-matched snapshot sessions.

The protocol (flush lock -> N CONSISTENT SNAPSHOT transactions -> vote
on the observed binlog position; ref src/paradump/paradump.go:100-355)
is exercised against a fake MySQL server that models exactly the
behavior that matters: the binlog position advances on writes, a flush
lock freezes it, and a session's transaction pins the position it
started at.  The parallel chunk exporter is then proven on real sqlite
connections: chunked parallel export == the whole table.
"""

import sqlite3
import threading

import pytest

from paradump_spark.sources.snapshot import (
    FLUSH_LOCK_SQL,
    START_SNAPSHOT_SQL,
    UNLOCK_SQL,
    BinlogPosition,
    SnapshotPool,
    SnapshotSyncError,
    synchronized_export,
    synchronized_mysql_sessions,
)


class FakeMysqlServer:
    """Binlog-position semantics only: writes advance the position unless
    the flush lock is held; a CONSISTENT SNAPSHOT transaction pins the
    position it observed at start."""

    def __init__(self, honor_lock: bool = True, drift_per_start: int = 0):
        self.pos = 1000
        self.locked = False
        self.honor_lock = honor_lock
        self.drift_per_start = drift_per_start  # simulates racing commits
        self.mu = threading.Lock()
        self.events: list[str] = []

    def log(self, ev: str) -> None:
        with self.mu:
            self.events.append(ev)


class FakeCursor:
    def __init__(self, conn: "FakeConnection"):
        self.conn = conn
        self._rows: list[tuple] = []

    def execute(self, sql: str):
        srv = self.conn.server
        s = sql.strip().upper()
        if self.conn.closed:
            raise RuntimeError("cursor on closed connection")
        if s == FLUSH_LOCK_SQL:
            with srv.mu:
                srv.locked = True
                srv.events.append("LOCK")
        elif s == UNLOCK_SQL:
            with srv.mu:
                srv.locked = False
                srv.events.append("UNLOCK")
        elif s == START_SNAPSHOT_SQL:
            with srv.mu:
                srv.events.append("START_SNAPSHOT")
                if srv.drift_per_start and not (srv.locked and srv.honor_lock):
                    srv.pos += srv.drift_per_start
                self.conn.snapshot_pos = BinlogPosition("binlog.000007", srv.pos)
        elif s in ("SHOW MASTER STATUS", "SHOW BINARY LOG STATUS"):
            with srv.mu:
                pos = self.conn.snapshot_pos or BinlogPosition(
                    "binlog.000007", srv.pos
                )
            self._rows = [(pos.name, pos.pos, "", "", "")]
        else:
            self.conn.session_sql.append(sql)

    def fetchone(self):
        return self._rows[0] if self._rows else None


class FakeConnection:
    def __init__(self, server: FakeMysqlServer):
        self.server = server
        self.snapshot_pos: BinlogPosition | None = None
        self.session_sql: list[str] = []
        self.closed = False

    def cursor(self):
        return FakeCursor(self)

    def rollback(self):
        pass

    def close(self):
        self.closed = True


def test_synchronized_sessions_agree_under_lock():
    srv = FakeMysqlServer()
    made: list[FakeConnection] = []

    def factory():
        c = FakeConnection(srv)
        made.append(c)
        return c

    pool = synchronized_mysql_sessions(factory, target_count=4)
    assert len(pool.connections) == 4
    assert pool.position == BinlogPosition("binlog.000007", 1000)
    assert pool.candidates == 12  # 4 x overprovision(3)
    assert pool.matched == 11  # every candidate agreed under the lock

    # pooled sessions stay open in their snapshot transaction; the lock
    # holder and the surplus are closed
    open_conns = [c for c in made if not c.closed]
    assert len(open_conns) == 4
    for c in open_conns:
        assert c.snapshot_pos == pool.position
        # session prep ran before the snapshot started (REPEATABLE READ
        # is what makes the snapshot a stable read view)
        assert any("REPEATABLE READ" in q for q in c.session_sql)

    # protocol ordering: every snapshot started while the lock was held
    lock_i = srv.events.index("LOCK")
    unlock_i = srv.events.index("UNLOCK")
    starts = [i for i, e in enumerate(srv.events) if e == "START_SNAPSHOT"]
    assert starts and all(lock_i < i < unlock_i for i in starts)

    pool.close()
    assert all(c.closed for c in made)


def test_synchronized_sessions_fail_when_positions_drift():
    # a server whose flush lock does NOT stop racing commits: every
    # snapshot lands on a different position, no position reaches the
    # target vote, and the protocol must refuse rather than hand back a
    # torn "snapshot"
    srv = FakeMysqlServer(honor_lock=False, drift_per_start=7)
    made: list[FakeConnection] = []

    def factory():
        c = FakeConnection(srv)
        made.append(c)
        return c

    with pytest.raises(SnapshotSyncError, match="no binlog position"):
        synchronized_mysql_sessions(factory, target_count=4)
    assert all(c.closed for c in made)  # nothing leaks on failure


def test_synchronized_sessions_single_target_still_votes():
    srv = FakeMysqlServer()
    pool = synchronized_mysql_sessions(
        lambda: FakeConnection(srv), target_count=1
    )
    assert len(pool.connections) == 1
    assert pool.matched >= 1
    pool.close()


def test_synchronized_export_covers_table(tmp_path):
    import duckdb

    from paradump_spark.plans.split import Chunk

    db = tmp_path / "src.db"
    seed = sqlite3.connect(db)
    seed.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    seed.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"row-{i}") for i in range(1, 1001)]
    )
    seed.commit()
    seed.close()

    # four live sqlite connections standing in for the synchronized pool
    conns = [sqlite3.connect(db, check_same_thread=False) for _ in range(4)]
    pool = SnapshotPool(
        connections=conns,
        position=BinlogPosition("binlog.000001", 4),
        candidates=12,
        matched=11,
    )
    chunks = [
        Chunk(0, None, (250,)),
        Chunk(1, (250,), (500,)),
        Chunk(2, (500,), (750,)),
        Chunk(3, (750,), None),
        Chunk(4, (2000,), (3000,)),  # empty slice -> empty parquet file
    ]
    out = tmp_path / "export"
    total = synchronized_export(pool, "t", str(out), chunks, ["id"])
    pool.close()

    assert total == 1000
    con = duckdb.connect()
    n, lo, hi, nd = con.execute(
        "SELECT count(*), min(id), max(id), count(DISTINCT id) "
        f"FROM read_parquet('{out}/part-*.parquet')"
    ).fetchone()
    assert (n, lo, hi, nd) == (1000, 1, 1000, 1000)
    # one file per chunk, including the empty one
    files = sorted(p.name for p in out.glob("part-*.parquet"))
    assert files == [f"part-{i:05d}.parquet" for i in range(5)]
