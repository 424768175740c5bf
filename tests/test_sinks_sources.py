"""Sink round-trips (reference golden-output philosophy,
/root/reference/test/run_test.sh:267-313, :801-882) and source SQL
builders."""

import glob
import sqlite3

import pytest
from pyspark.sql import functions as F

from paradump_spark.functions.render import (
    float_canonical,
    mysql_escape,
    trim_fractional_seconds,
)
from paradump_spark.operators.diff import diff_classified
from paradump_spark.plans.split import Chunk
from paradump_spark.sinks.dml import (
    ApplyOptions,
    DmlTemplates,
    apply_diff,
    clamp_batch_size,
    copy_table,
)
from paradump_spark.sinks.files import (
    SQL_FILE_HEADER,
    write_csv,
    write_noop,
    write_sql_inserts,
)
from paradump_spark.sources.jdbc import (
    JdbcSource,
    SnapshotMode,
    columns_sql,
    filter_excluded,
    introspect_table,
    list_tables_sql,
    primary_key_sql,
    table_stats_sql,
)


@pytest.fixture()
def cust(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


# --- file sinks -----------------------------------------------------------


def test_sql_insert_files(cust, tmp_path):
    write_sql_inserts(cust, "customer", str(tmp_path / "sql"), insertsize=40)
    [f] = glob.glob(str(tmp_path / "sql" / "part-*"))
    txt = open(f).read()
    assert txt.startswith(SQL_FILE_HEADER)
    # 150 rows / 40 per statement -> 4 statements
    assert txt.count("INSERT INTO `customer`") == 4
    assert txt.rstrip().endswith(");")


def test_sql_insert_row_conservation(cust, tmp_path):
    write_sql_inserts(cust, "customer", str(tmp_path / "sql"), insertsize=10)
    lines = [
        ln
        for f in glob.glob(str(tmp_path / "sql" / "part-*"))
        for ln in open(f).read().splitlines()
    ]
    # reference invariant: rendered tuples == count(*) (run_test.sh:621-646)
    tuples = [ln for ln in lines if ln.startswith("(")]
    assert len(tuples) == cust.count()


def test_csv_native_roundtrip(cust, spark, tmp_path):
    write_csv(cust, str(tmp_path / "csv"))
    back = (
        spark.read.option("nullValue", "\\N")
        .option("quote", '"')
        .option("escape", '"')
        .schema(cust.schema)
        .csv(str(tmp_path / "csv"))
    )
    assert back.exceptAll(cust).count() == 0
    assert cust.exceptAll(back).count() == 0


def test_csv_exact_quoting(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'a,"b', None), (2, "plain", 3.5)], "id bigint, s string, d double"
    )
    write_csv(df, str(tmp_path / "csv"), exact=True)
    lines = sorted(
        ln
        for f in glob.glob(str(tmp_path / "csv" / "part-*"))
        for ln in open(f).read().splitlines()
    )
    assert lines == ['1,"a,""b",', "2,plain,3.5"]


def test_noop_sink(cust):
    write_noop(cust)


# --- render scalars -------------------------------------------------------


def _one(spark, expr, value, typ="string"):
    return (
        spark.createDataFrame([(value,)], f"v {typ}")
        .select(expr.alias("r"))
        .first()["r"]
    )


def test_mysql_escape_order(spark):
    # backslash escaped first, then quotes: \' -> \\\'
    assert _one(spark, mysql_escape(F.col("v")), "\\'") == "\\\\\\'"
    assert _one(spark, mysql_escape(F.col("v")), "a\nb") == "a\\nb"


def test_float_canonical(spark):
    assert _one(spark, float_canonical(F.col("v")), 5.0, "double") == "5"
    assert _one(spark, float_canonical(F.col("v")), 1320.51, "double") == "1320.51"


def test_trim_fractional_seconds(spark):
    assert _one(spark, trim_fractional_seconds(F.col("v")), "12:00:00.500000") == "12:00:00.50"
    assert _one(spark, trim_fractional_seconds(F.col("v")), "12:00:00.123450") == "12:00:00.12345"
    assert _one(spark, trim_fractional_seconds(F.col("v")), "12:00:00.000000") == "12:00:00.00"


# --- DML sinks ------------------------------------------------------------


def test_dml_templates():
    t = DmlTemplates("t", ["a", "b", "c"], ["a"])
    assert t.insert_sql == "INSERT INTO `t` (`a`, `b`, `c`) VALUES (?, ?, ?)"
    assert t.update_sql == "UPDATE `t` SET `b` = ?, `c` = ? WHERE `a` = ?"
    assert t.delete_sql == "DELETE FROM `t` WHERE `a` = ?"


def test_mssql_batch_clamp():
    # ref: insert_size = 2099 / cntCols (paradump.go:3729-3734)
    assert clamp_batch_size(500, 10, "mssql") == 209
    assert clamp_batch_size(500, 10, "mysql") == 500


def test_apply_diff_converges_sqlite(cust, spark, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE customer (c_custkey INTEGER PRIMARY KEY, c_name TEXT,"
        " c_nationkey INTEGER, c_acctbal REAL, c_mktsegment TEXT)"
    )
    dst = cust.where(F.col("c_custkey") % 3 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(0.0)).otherwise(F.col("c_acctbal")),
    )
    con.executemany(
        "INSERT INTO customer VALUES (?,?,?,?,?)", [tuple(r) for r in dst.collect()]
    )
    con.commit()
    con.close()
    cl = diff_classified(cust, dst, ["c_custkey"]).coalesce(1)
    tmpl = DmlTemplates("customer", list(cust.columns), ["c_custkey"], quote='"')
    apply_diff(cl, lambda: sqlite3.connect(db), tmpl)
    got = sqlite3.connect(db).execute(
        "SELECT * FROM customer ORDER BY c_custkey"
    ).fetchall()
    assert got == sorted(tuple(r) for r in cust.collect())


def test_apply_diff_kill_switches(cust, spark, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE customer (c_custkey INTEGER PRIMARY KEY, c_name TEXT,"
                " c_nationkey INTEGER, c_acctbal REAL, c_mktsegment TEXT)")
    con.commit()
    con.close()
    cl = diff_classified(
        cust, cust.where(F.lit(False)), ["c_custkey"]
    ).coalesce(1)  # everything is an INSERT
    tmpl = DmlTemplates("customer", list(cust.columns), ["c_custkey"], quote='"')
    apply_diff(cl, lambda: sqlite3.connect(db), tmpl, ApplyOptions(no_insert=True))
    assert sqlite3.connect(db).execute("SELECT count(*) FROM customer").fetchone()[0] == 0


def test_copy_table_sqlite(cust, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE c2 (c_custkey INTEGER, c_name TEXT,"
                " c_nationkey INTEGER, c_acctbal REAL, c_mktsegment TEXT)")
    con.commit()
    con.close()
    copy_table(cust.coalesce(1), lambda: sqlite3.connect(db), "c2", quote='"')
    assert sqlite3.connect(db).execute("SELECT count(*) FROM c2").fetchone()[0] == 150


# --- JDBC source ----------------------------------------------------------


def test_list_tables_sql_and_exclusion():
    sql = list_tables_sql("mysql", ["foobar", "barfoo"])
    assert "BASE TABLE" in sql and "'foobar'" in sql
    tables = [("foobar", "client_info"), ("foobar", "tmp_x"), ("barfoo", "y")]
    assert filter_excluded(tables, ["tmp_"]) == [("foobar", "client_info"), ("barfoo", "y")]


@pytest.mark.parametrize("dialect", ["mysql", "postgres", "mssql"])
def test_introspection_sql_builders(dialect):
    assert "information_schema.columns" in columns_sql(dialect, "s", "t")
    assert primary_key_sql(dialect, "s", "t")
    assert table_stats_sql(dialect, "s", "t")


def test_introspect_table_with_fake_runner():
    responses = {
        "columns": [
            ("id", "bigint", "NO", "bigint unsigned", None, 20, 0),
            ("name", "varchar", "YES", "varchar(64)", None, None, None),
            ("ts", "datetime", "YES", "datetime(3)", 3, None, None),
        ],
        "statistics": [("id",)],
        "tables": [(1024, 42, "InnoDB")],
    }

    def run(sql):
        for key, rows in responses.items():
            if key in sql:
                return rows
        raise AssertionError(sql)

    meta = introspect_table(run, "mysql", "foobar", "client_info")
    assert meta.primary_key == ["id"]
    assert meta.column("id").spark_type.simpleString() == "decimal(20,0)"  # unsigned bigint
    assert meta.column("ts").dt_prec == 3
    assert meta.est_rows == 42 and meta.storage_engine == "InnoDB"


def test_jdbc_source_options():
    src = JdbcSource("jdbc:mysql://h/db", {"user": "u"}, "mysql")
    opts = src.reader_options()
    assert opts["sessionInitStatement"].startswith("SET TIME_ZONE")
    pg = JdbcSource("jdbc:postgresql://h/db", {}, "postgres", SnapshotMode.PG_SNAPSHOT)
    o = pg.pg_snapshot_options("000003A1-1")
    assert "SET TRANSACTION SNAPSHOT '000003A1-1'" in o["sessionInitStatement"]
    assert pg.quote == '"'


def test_chunk_predicates_reach_reader():
    """read_chunked must pass one predicate per chunk to spark.read.jdbc."""
    captured = {}

    class FakeReader:
        def jdbc(self, url, table, predicates, properties):
            captured["predicates"] = predicates

            class D:
                def select(self, *c):
                    return self

            return D()

    class FakeSpark:
        read = FakeReader()

    from paradump_spark.meta import meta_from_dataframe
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType())])
    meta = meta_from_dataframe("db", "t", schema, primary_key=["id"])
    src = JdbcSource("jdbc:mysql://h/db", {}, "mysql")
    chunks = [Chunk(0, None, (10,)), Chunk(1, (10,), (20,)), Chunk(2, (20,), None)]
    src.read_chunked(FakeSpark(), "t", meta, chunks)
    assert captured["predicates"] == [
        "((`id` < 10))",
        "((`id` >= 10)) AND ((`id` < 20))",
        "((`id` >= 20))",
    ]


def test_csv_dump_round_trip_diffs_clean(spark, sf_dir, tmp_path):
    """dump → read back → diff == 0 DML: the end-to-end completeness check."""
    from paradump_spark.operators.diff import diff_classified
    from paradump_spark.sinks.files import write_csv
    from paradump_spark.sources.files import read_csv_dump

    for table, pk in [("customer", ["c_custkey"]), ("orders", ["o_orderkey"])]:
        src = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        out = str(tmp_path / f"csv_{table}")
        write_csv(src, out)
        back = read_csv_dump(spark, out, src.schema)
        assert back.count() == src.count()
        assert diff_classified(src, back, pk).count() == 0


def test_dump_file_template_rename(spark, sf_dir, tmp_path):
    """K1 %p naming parity: part files renamed per the reference template."""
    from paradump_spark.sinks.files import (
        render_file_template,
        rename_dump_files,
        write_sql_inserts,
    )

    assert (
        render_file_template("dump_%d_%t_%p%m%z", "db", "cust", 3, "sql", "zstd")
        == "dump_db_cust_3.sql.zst"
    )
    assert render_file_template("a%%b%p", "d", "t", 0, "csv") == "a%b0"

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = str(tmp_path / "sqldump")
    write_sql_inserts(cust, "customer", out, partitions=2)
    names = rename_dump_files(out, "dump_%d_%t_%p%m%z", "tpch", "customer", "sql")
    assert names == ["dump_tpch_customer_0.sql", "dump_tpch_customer_1.sql"]
    import os

    assert all(os.path.exists(os.path.join(out, n)) for n in names)


def test_file_template_escaping_and_collision_guard(spark, sf_dir, tmp_path):
    from paradump_spark.sinks.files import render_file_template, rename_dump_files, write_csv

    # %% is a literal percent and never re-expands; values with directive-
    # like substrings don't cascade
    assert render_file_template("x%%py", "d", "t", 3, "sql") == "x%py"
    assert render_file_template("%d_%t", "a%tb", "T", 0, "csv") == "a%tb_T"

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = str(tmp_path / "c")
    write_csv(cust.repartition(2), out)
    import pytest

    with pytest.raises(ValueError):
        rename_dump_files(out, "dump_%d_%t%m", "db", "cust", "csv")  # no %p


def test_zstd_dump_roundtrip_with_real_zstdcat(spark, sf_dir, tmp_path):
    """K3 text-zstd via the pyarrow finalize pass: the .zst part files
    must be STANDARD zstd (zstdcat decodes them) and the decompressed
    dump must contain every row — the ref's `zstdcat | wc -l` check
    (test/run_test.sh:674-698)."""
    import os
    import shutil
    import subprocess

    from paradump_spark.sinks.files import write_csv, write_sql_inserts

    docs = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = docs.count()
    out = str(tmp_path / "csvz")
    write_csv(docs, out, compression="zstd", compression_level=3)
    parts = [f for f in os.listdir(out) if f.endswith(".zst")]
    assert parts, "no .zst part files written"
    assert not [
        f for f in os.listdir(out)
        if f.startswith("part-") and not f.endswith((".zst", ".crc"))
    ], "uncompressed originals must be removed"
    zstdcat = shutil.which("zstdcat") or shutil.which("zstd")

    def _zcat(path):
        # prefer the real zstd CLI (fully independent decoder); fall back
        # to pyarrow's streaming reader, which still proves the file is a
        # STANDARD framed .zst (it rejects raw/hadoop-block formats)
        if zstdcat:
            return subprocess.run(
                [zstdcat, path], capture_output=True, check=True
            ).stdout
        import pyarrow as pa

        with open(path, "rb") as fh:
            return pa.input_stream(
                pa.BufferReader(fh.read()), compression="zstd"
            ).read()

    total = 0
    for f in parts:
        total += _zcat(os.path.join(out, f)).count(b"\n")
    assert total == n

    # sql mode: the INSERT text survives the codec byte-for-byte
    out2 = str(tmp_path / "sqlz")
    write_sql_inserts(
        docs.limit(50), "customer", out2, insertsize=10,
        compression="zstd", compression_level=1,
    )
    z = [f for f in os.listdir(out2) if f.endswith(".zst")]
    assert z
    blob = b""
    for f in sorted(z):
        blob += _zcat(os.path.join(out2, f))
    assert blob.count(b"INSERT INTO") == 5  # 50 rows / insertsize 10
    assert b"SET NAMES utf8mb4;" in blob


def test_gzip_text_compression_still_streams_through_hadoop(spark, sf_dir, tmp_path):
    import gzip
    import os

    from paradump_spark.sinks.files import write_csv

    out = str(tmp_path / "csvgz")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_csv(nat, out, compression="gzip")
    gz = [f for f in os.listdir(out) if f.endswith(".gz")]
    assert gz
    rows = sum(
        gzip.open(os.path.join(out, f)).read().count(b"\n") for f in gz
    )
    assert rows == nat.count()


def test_jsonl_dump_roundtrip(spark, sf_dir, tmp_path):
    """jsonl mode round-trips through spark.read.json, uncompressed and
    through the zstd finalize path."""
    import os

    from paradump_spark.sinks.files import write_jsonl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "jd")
    write_jsonl(docs, out)
    back = spark.read.schema(docs.schema).json(out)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0

    outz = str(tmp_path / "jdz")
    write_jsonl(docs, outz, compression="zstd", compression_level=3)
    zparts = [f for f in os.listdir(outz) if f.endswith(".zst")]
    assert zparts and not [
        f for f in os.listdir(outz)
        if f.startswith("part-") and not f.endswith((".zst", ".crc"))
    ]
    # spark reads .zst text/json natively on the inbound side
    backz = spark.read.schema(docs.schema).json(outz)
    assert backz.count() == docs.count()
    assert backz.exceptAll(docs).count() == 0


def test_jsonl_dump_via_cli(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main as cli_main

    out = str(tmp_path / "dumpjl")
    rc = cli_main(
        ["dump", "--directory", sf_dir, "--output", out, "--mode", "jsonl",
         "--table", "nation"]
    )
    assert rc == 0
    assert "mode=jsonl" in capsys.readouterr().out
    import os
    files = os.listdir(os.path.join(out, "nation"))
    assert any(f.startswith("part-") for f in files)
    back = spark.read.json(os.path.join(out, "nation"))
    assert back.count() == 25


def test_orc_dump_round_trip(spark, sf_dir, tmp_path):
    """ORC dump mode: checksum-identical content on read-back."""
    from paradump_spark.catalog import ParquetCatalog
    from paradump_spark.dump import DumpOptions, dump_tables
    from paradump_spark.operators.checksum import table_checksum

    cat = ParquetCatalog(spark, sf_dir)
    out = str(tmp_path / "orc")
    res = dump_tables(cat, out, ["nation"], DumpOptions(mode="orc"))
    assert res[0].mode == "orc"
    back = spark.read.orc(res[0].path)
    src = cat.load("nation")
    a = table_checksum(src).collect()[0]
    b = table_checksum(back).collect()[0]
    assert (a["n_rows"], str(a["hash_sum"])) == (b["n_rows"], str(b["hash_sum"]))


def test_jsonl_zst_round_trip_diff_zero(spark, sf_dir, tmp_path):
    """Full JSONL-zstd loop: write_jsonl(compression='zstd') →
    read_jsonl_zst → diff_classified == 0 DML (the reference's
    dump-readback-diff consistency contract on the K3 zstd path)."""
    from paradump_spark.sinks.files import write_jsonl
    from paradump_spark.sources.files import read_jsonl_zst, read_text_zst

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "jz")
    write_jsonl(docs, out, compression="zstd", compression_level=3)
    import glob as g

    assert g.glob(out + "/*.zst"), "finalize pass must emit .zst parts"
    back = read_jsonl_zst(spark, out, docs.schema)
    assert back.count() == docs.count()
    assert diff_classified(docs, back, ["doc_id"]).count() == 0
    # the raw line reader sees one line per row
    assert read_text_zst(spark, out).count() == docs.count()
