"""Partitioned JDBC source — the Spark restatement of the reference's
table lister (S1, src/paradump/paradump.go:1309-1368), metadata scan
(S2, :1119-1285 mysql / :878-992 pg / :995-1116 mssql), and chunk readers
(S4 :1844-1979, S5 src/parasync/parasync.go:2182-2351).

Execution model: the driver introspects and plans; each element of the
``predicates[]`` array becomes exactly one Spark partition whose executor
runs exactly the reference's interval query — but N-wide across the
cluster instead of 10 goroutines on one host.

Consistency (S6): the reference coordinates N MySQL connections onto one
binlog position (src/paradump/paradump.go:243-355).  Spark JDBC partitions
open independent connections, so the engine exposes an explicit policy
instead (SURVEY §7 phase 4) — and ``sources/snapshot.py`` implements the
reference's full flush-lock + position-vote protocol for the MySQL case
(synchronized session pool + parallel chunk export):

* ``EVENTUAL``  — per-partition reads at slightly different instants
  (what plain ``spark.read.jdbc`` gives); the default, documented.
* ``SINGLE_TX`` — one driver-side transaction exports to storage, Spark
  reads the export (serialized export, parallel everything after).
* ``PG_SNAPSHOT`` — PostgreSQL ``pg_export_snapshot()``: every partition
  runs ``SET TRANSACTION SNAPSHOT '<id>'`` via ``sessionInitStatement`` —
  the cross-connection snapshot the reference only sketches in comments
  (:397-400).

No live database exists in this environment; the SQL builders and the
plan wiring are exercised by unit tests, and ``read_chunked`` is a thin
``spark.read.jdbc`` call.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from paradump_spark.meta import ColumnMeta, TableMeta, mysql_type_to_spark
from paradump_spark.plans.split import Chunk, chunk_predicates_sql


class SnapshotMode(Enum):
    EVENTUAL = "eventual"
    SINGLE_TX = "single_tx"
    PG_SNAPSHOT = "pg_snapshot"


def sql_str(value: str) -> str:
    """SQL string literal from an untrusted name: embedded single quotes
    doubled, so a schema/table name containing ``'`` can neither break
    the introspection query nor inject into the source DB."""
    return "'" + str(value).replace("'", "''") + "'"


def quote_ident(name: str, dialect: str = "ansi") -> str:
    """Quoted SQL identifier (``"`` doubling; backticks for mysql)."""
    if dialect == "mysql":
        return "`" + str(name).replace("`", "``") + "`"
    return '"' + str(name).replace('"', '""') + '"'


# ---------------------------------------------------------------------------
# S1 — table listing


def list_tables_sql(dialect: str, schemas: Sequence[str]) -> str:
    """Base-table enumeration per dialect (ref GetListTables :1309-1368;
    pg/mssql variants use the same information_schema surface)."""
    in_list = ", ".join(sql_str(s) for s in schemas)
    if dialect in ("mysql", "mssql", "postgres"):
        return (
            "SELECT table_schema, table_name FROM information_schema.tables "
            f"WHERE table_type = 'BASE TABLE' AND table_schema IN ({in_list})"
        )
    raise ValueError(dialect)


def filter_excluded(
    tables: Sequence[tuple[str, str]], excludes: Sequence[str] | None
) -> list[tuple[str, str]]:
    """P5 substring exclusion on ``schema.table`` (ref :1356-1366)."""
    if not excludes:
        return list(tables)
    return [
        (s, t)
        for s, t in tables
        if not any(x in f"{s}.{t}" for x in excludes)
    ]


# ---------------------------------------------------------------------------
# S2 — metadata introspection


def columns_sql(dialect: str, schema: str, table: str) -> str:
    if dialect == "mysql":
        # ref GetMysqlBasicMetadataInfo :796-816
        return (
            "SELECT column_name, data_type, is_nullable, column_type, "
            "datetime_precision, numeric_precision, numeric_scale "
            "FROM information_schema.columns "
            f"WHERE table_schema = {sql_str(schema)} AND table_name = {sql_str(table)} "
            "ORDER BY ordinal_position"
        )
    if dialect == "postgres":
        # ref :878-992
        return (
            "SELECT column_name, data_type, is_nullable, udt_name, "
            "datetime_precision, numeric_precision, numeric_scale "
            "FROM information_schema.columns "
            f"WHERE table_schema = {sql_str(schema)} AND table_name = {sql_str(table)} "
            "ORDER BY ordinal_position"
        )
    if dialect == "mssql":
        # ref :995-1116
        return (
            "SELECT column_name, data_type, is_nullable, data_type, "
            "datetime_precision, numeric_precision, numeric_scale "
            "FROM information_schema.columns "
            f"WHERE table_schema = {sql_str(schema)} AND table_name = {sql_str(table)} "
            "ORDER BY ordinal_position"
        )
    raise ValueError(dialect)


def primary_key_sql(dialect: str, schema: str, table: str) -> str:
    if dialect == "mysql":
        # ref :821 — INFORMATION_SCHEMA.STATISTICS INDEX_NAME='PRIMARY'
        return (
            "SELECT column_name FROM information_schema.statistics "
            f"WHERE table_schema = {sql_str(schema)} AND table_name = {sql_str(table)} "
            "AND index_name = 'PRIMARY' ORDER BY seq_in_index"
        )
    if dialect == "postgres":
        # ref :936-938 — pg_index/pg_attribute
        return (
            "SELECT a.attname FROM pg_index i "
            "JOIN pg_class c ON c.oid = i.indrelid "
            "JOIN pg_namespace n ON n.oid = c.relnamespace "
            "JOIN pg_attribute a ON a.attrelid = c.oid "
            " AND a.attnum = ANY(i.indkey) "
            f"WHERE n.nspname = {sql_str(schema)} AND c.relname = {sql_str(table)} "
            "AND i.indisprimary ORDER BY array_position(i.indkey, a.attnum)"
        )
    if dialect == "mssql":
        # ref :1061-1063 — TABLE_CONSTRAINTS + KEY_COLUMN_USAGE
        return (
            "SELECT k.column_name "
            "FROM information_schema.table_constraints t "
            "JOIN information_schema.key_column_usage k "
            " ON k.constraint_name = t.constraint_name "
            f"WHERE t.table_schema = {sql_str(schema)} AND t.table_name = {sql_str(table)} "
            "AND t.constraint_type = 'PRIMARY KEY' ORDER BY k.ordinal_position"
        )
    raise ValueError(dialect)


def table_stats_sql(dialect: str, schema: str, table: str) -> str:
    if dialect == "mysql":
        # ref :773 — size + estimated rows + engine
        return (
            "SELECT data_length + index_length, table_rows, engine "
            "FROM information_schema.tables "
            f"WHERE table_schema = {sql_str(schema)} AND table_name = {sql_str(table)}"
        )
    if dialect == "postgres":
        # ref :911-918 — pg_total_relation_size + reltuples
        return (
            "SELECT pg_total_relation_size(c.oid), c.reltuples::bigint, 'heap' "
            "FROM pg_class c JOIN pg_namespace n ON n.oid = c.relnamespace "
            f"WHERE n.nspname = {sql_str(schema)} AND c.relname = {sql_str(table)}"
        )
    if dialect == "mssql":
        # ref :1011-1020 — sys.partitions + sys.allocation_units
        return (
            "SELECT SUM(a.total_pages) * 8 * 1024, MAX(p.rows), 'mssql' "
            "FROM sys.tables t "
            "JOIN sys.schemas s ON t.schema_id = s.schema_id "
            "JOIN sys.partitions p ON t.object_id = p.object_id "
            "JOIN sys.allocation_units a ON p.partition_id = a.container_id "
            f"WHERE s.name = {sql_str(schema)} AND t.name = {sql_str(table)} "
            "GROUP BY t.name"
        )
    raise ValueError(dialect)


def index_stats_sql(dialect: str, schema: str, table: str) -> str:
    """Secondary-index inventory for fake-PK promotion (ref
    GuessPrimaryKey, src/paradump/paradump.go:1200-1228)."""
    if dialect == "mysql":
        return (
            "SELECT index_name, seq_in_index, column_name, cardinality, nullable "
            "FROM information_schema.statistics "
            f"WHERE table_schema = {sql_str(schema)} AND table_name = {sql_str(table)} "
            "AND index_name <> 'PRIMARY' ORDER BY index_name, seq_in_index"
        )
    raise ValueError(f"fake-PK promotion implemented for mysql only, not {dialect}")


def guess_primary_key(run: "QueryRunner", schema: str, table: str) -> list[str]:
    """Promote the highest-cardinality all-NOT-NULL index to a fake PK
    (ref :1200-1228).  A fake PK admits duplicate key runs — chunk
    planning tolerates that (heavy-hitter boundaries collapse), unlike
    the reference which must grow chunks ×1.5 around duplicates
    (:1742-1747).  Returns [] when no usable index exists (error bit 2).
    """
    by_index: dict[str, list[tuple[int, str, int, str]]] = {}
    for name, seq, col, card, nullable in run(index_stats_sql("mysql", schema, table)):
        by_index.setdefault(str(name), []).append(
            (int(seq), str(col), int(card or 0), str(nullable or ""))
        )
    best: tuple[int, list[str]] | None = None
    for cols in by_index.values():
        cols.sort()
        if any(n.upper() == "YES" for _, _, _, n in cols):
            continue  # nullable column -> unusable as key
        cardinality = max(c for _, _, c, _ in cols)
        if best is None or cardinality > best[0]:
            best = (cardinality, [c for _, c, _, _ in cols])
    return best[1] if best else []


QueryRunner = Callable[[str], list[tuple[Any, ...]]]
"""Executes one SQL string on the source DB, returns rows.  Injectable so
tests stub it; production wraps a DBAPI cursor or a 1-row spark.read.jdbc."""


def introspect_table(
    run: QueryRunner, dialect: str, schema: str, table: str
) -> TableMeta:
    """S2: build a TableMeta from live information_schema queries."""
    cols: list[ColumnMeta] = []
    for name, data_type, nullable, col_type, dt_prec, nu_prec, nu_scale in run(
        columns_sql(dialect, schema, table)
    ):
        unsigned = "unsigned" in str(col_type).lower()
        spark_type = mysql_type_to_spark(
            str(data_type), unsigned, int(nu_prec or 10), int(nu_scale or 0)
        ) if dialect == "mysql" else mysql_type_to_spark(
            _PG_TO_MYSQL_KIND.get(str(data_type).lower(), str(data_type).lower())
        )
        cols.append(
            ColumnMeta(
                name=str(name),
                sql_type=str(data_type).lower(),
                spark_type=spark_type,
                nullable=str(nullable).upper() == "YES",
                dt_prec=int(dt_prec or 0),
                nu_prec=int(nu_prec or 0),
            )
        )
    pk = [str(r[0]) for r in run(primary_key_sql(dialect, schema, table))]
    stats = run(table_stats_sql(dialect, schema, table))
    size, rows, engine = (stats[0] if stats else (0, 0, ""))
    return TableMeta(
        db_name=schema,
        tb_name=table,
        columns=cols,
        primary_key=pk,
        size_bytes=int(size or 0),
        est_rows=int(rows or 0),
        storage_engine=str(engine or ""),
    )


# minimal cross-dialect kind mapping for non-MySQL sources
_PG_TO_MYSQL_KIND = {
    "integer": "int",
    "smallint": "smallint",
    "bigint": "bigint",
    "real": "float",
    "double precision": "double",
    "numeric": "decimal",
    "character varying": "varchar",
    "character": "char",
    "text": "text",
    "bytea": "blob",
    "date": "date",
    "timestamp without time zone": "datetime",
    "timestamp with time zone": "timestamp",
    "boolean": "tinyint",
    "json": "json",
    "jsonb": "json",
    "nvarchar": "varchar",
    "varbinary": "varbinary",
    "datetime2": "datetime",
    "uniqueidentifier": "varchar",
}


def copy_cursor_to_parquet(cur, out_path: str, batch_rows: int = 50_000) -> int:
    """Stream an already-executed DBAPI cursor to one parquet file.

    Schema inference holds early batches until every column has a
    concrete type (a column that is all-NULL at the start must not
    freeze the file schema as the null type; never-seen columns fall
    back to string).  Returns the number of rows written.  Shared by
    :func:`single_tx_export` and the synchronized snapshot exporter
    (``sources/snapshot.py``).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = [d[0] for d in cur.description]
    writer = None
    pending: list = []  # batches held until every column's type is known
    total = 0

    def _resolved(schema) -> bool:
        return not any(pa.types.is_null(f.type) for f in schema)

    def _finalize_schema(schema):
        # columns that never produced a value fall back to string
        return pa.schema(
            [
                pa.field(f.name, pa.string() if pa.types.is_null(f.type) else f.type)
                for f in schema
            ]
        )

    try:
        while True:
            rows = cur.fetchmany(batch_rows)
            if not rows:
                break
            batch = pa.table({n: [r[i] for r in rows] for i, n in enumerate(names)})
            total += len(rows)
            if writer is not None:
                writer.write_table(batch.cast(writer.schema))
                continue
            pending.append(batch)
            unified = pa.unify_schemas(
                [t.schema for t in pending], promote_options="permissive"
            )
            if _resolved(unified):
                writer = pq.ParquetWriter(out_path, unified)
                for t in pending:
                    writer.write_table(t.cast(unified))
                pending.clear()
        if writer is None:
            schema = _finalize_schema(
                pa.unify_schemas(
                    [t.schema for t in pending], promote_options="permissive"
                )
                if pending
                else pa.schema([pa.field(n, pa.string()) for n in names])
            )
            writer = pq.ParquetWriter(out_path, schema)
            for t in pending:
                writer.write_table(t.cast(schema))
            if not pending:
                writer.write_table(schema.empty_table())
    finally:
        if writer is not None:
            writer.close()
    return total


def single_tx_export(
    connection_factory: Callable[[], object],
    table: str,
    out_path: str,
    columns: Sequence[str] | None = None,
    batch_rows: int = 50_000,
    begin_sql: str | None = None,
) -> int:
    """S6 SINGLE_TX mode, made real: ONE driver-side connection exports the
    table inside one transaction to a parquet file; Spark then reads the
    export in parallel.  Consistency of the read = consistency of that
    one transaction (REPEATABLE READ / snapshot isolation where the
    engine supports it via ``begin_sql``).

    The export itself is serialized (that's the price of a true snapshot
    without engine support for shared snapshots); for the parallel
    variant on MySQL see ``sources/snapshot.py`` (binlog-position-matched
    sessions).  Returns the number of rows exported.
    """
    conn = connection_factory()
    cur = conn.cursor()
    if begin_sql:
        cur.execute(begin_sql)
    cols = ", ".join(quote_ident(c) for c in columns) if columns else "*"
    tbl = ".".join(quote_ident(p) for p in table.split("."))
    cur.execute(f"SELECT {cols} FROM {tbl}")
    try:
        return copy_cursor_to_parquet(cur, out_path, batch_rows)
    finally:
        conn.rollback()
        conn.close()


# ---------------------------------------------------------------------------
# S4/S5 — partitioned chunk read


@dataclass
class JdbcSource:
    """One source database; ``read_chunked`` is the reference's whole
    browser→reader pipeline as a single partitioned read."""

    url: str
    properties: dict[str, str]
    dialect: str = "mysql"
    snapshot: SnapshotMode = SnapshotMode.EVENTUAL
    snapshot_id: str | None = None  # required when snapshot=PG_SNAPSHOT

    @property
    def quote(self) -> str:
        return "`" if self.dialect == "mysql" else '"'

    def reader_options(self) -> dict[str, str]:
        """Options honoring the declared snapshot mode — selecting
        PG_SNAPSHOT/SINGLE_TX must not silently degrade to EVENTUAL."""
        if self.snapshot is SnapshotMode.SINGLE_TX:
            raise ValueError(
                "snapshot=SINGLE_TX sources are read via single_tx_export() "
                "+ spark.read.parquet on the export, not partitioned JDBC"
            )
        if self.snapshot is SnapshotMode.PG_SNAPSHOT:
            if self.dialect != "postgres" or not self.snapshot_id:
                raise ValueError(
                    "snapshot=PG_SNAPSHOT requires dialect='postgres' and a "
                    "snapshot_id from pg_export_snapshot()"
                )
            return self.pg_snapshot_options(self.snapshot_id)
        opts = dict(self.properties)
        # force UTC like the reference's SET TIME_ZONE (:177, :385, :538)
        if self.dialect == "mysql":
            opts.setdefault("sessionInitStatement", "SET TIME_ZONE='+00:00'")
        return opts

    def read_chunked(
        self,
        spark: SparkSession,
        table: str,
        meta: TableMeta,
        chunks: Sequence[Chunk],
        columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """S4: one Spark partition per chunk predicate.  Each executor
        issues exactly ``SELECT cols FROM t WHERE <interval>`` — the
        reference's prepared interval query (:1270-1273) with the bounds
        inlined as typed literals (index-sargable)."""
        preds = chunk_predicates_sql(chunks, meta.primary_key, self.quote)
        df = spark.read.jdbc(
            url=self.url,
            table=table,
            predicates=list(preds),
            properties=self.reader_options(),
        )
        if columns:
            df = df.select(*columns)
        return df

    def read_single_partition_bounds(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str,
        lower: int,
        upper: int,
        num_partitions: int,
    ) -> DataFrame:
        """Numeric-PK fast path: Spark's built-in stride partitioning —
        equivalent to the reference's chunker when the key is dense."""
        return spark.read.jdbc(
            url=self.url,
            table=table,
            column=partition_column,
            lowerBound=lower,
            upperBound=upper,
            numPartitions=num_partitions,
            properties=self.reader_options(),
        )

    def pg_snapshot_options(self, snapshot_id: str) -> dict[str, str]:
        """S6 PG_SNAPSHOT: per-partition ``SET TRANSACTION SNAPSHOT`` so
        every executor connection sees one exported snapshot."""
        opts = dict(self.properties)
        opts["sessionInitStatement"] = (
            "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
            f"SET TRANSACTION SNAPSHOT '{snapshot_id}'"
        )
        return opts
