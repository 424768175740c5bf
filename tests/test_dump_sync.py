"""Top-level dump/sync orchestration tests (paradump/parasync entry
semantics) and fake-PK promotion."""

import glob
import sqlite3

import pytest
from pyspark.sql import functions as F

from paradump_spark.catalog import ParquetCatalog
from paradump_spark.dump import DumpOptions, dump_tables
from paradump_spark.sources.jdbc import guess_primary_key
from paradump_spark.sync import SyncOptions, apply_syncs, sync_report, sync_tables


@pytest.fixture()
def catalog(spark, sf_dir):
    return ParquetCatalog(spark, sf_dir)


def test_dump_sql_mode(catalog, tmp_path):
    res = dump_tables(
        catalog,
        str(tmp_path),
        tables=["region", "nation"],
        options=DumpOptions(mode="sql", insertsize=10),
    )
    # largest-first scheduling: nation (25 rows) before region (5)
    assert [r.table for r in res] == ["nation", "region"]
    txt = "".join(
        open(f).read() for f in glob.glob(str(tmp_path / "nation" / "part-*"))
    )
    assert txt.count("INSERT INTO `nation`") == 3  # 25 rows / 10


def test_dump_mode_validation(catalog, tmp_path):
    with pytest.raises(ValueError):
        dump_tables(catalog, str(tmp_path), options=DumpOptions(mode="bogus"))


def test_dump_excludes(catalog, tmp_path):
    res = dump_tables(
        catalog,
        str(tmp_path),
        options=DumpOptions(mode="nul", excludes=["lineitem", "orders", "events",
                                                  "documents", "embeddings", "part",
                                                  "customer", "supplier"]),
    )
    assert sorted(r.table for r in res) == ["nation", "region"]


def test_dump_csv_and_parquet(catalog, spark, tmp_path):
    dump_tables(
        catalog, str(tmp_path), tables=["region"], options=DumpOptions(mode="parquet")
    )
    back = spark.read.parquet(str(tmp_path / "region"))
    assert back.count() == 5


def test_sync_noop_reports_zero_dml(spark, sf_dir, catalog):
    """Reference invariant: no-op sync reports zero writes
    (/root/reference/test/run_test_sync.sh:111)."""
    syncs = sync_tables(catalog, catalog, tables=["customer", "orders"])
    rep = {
        (r["table"], r["action"]): r["cnt"]
        for r in sync_report(syncs).collect()
    }
    assert rep == {("customer", "NoOp"): 150, ("orders", "NoOp"): 1500}


def test_sync_apply_converges_sqlite(spark, sf_dir, catalog, tmp_path):
    cust = catalog.load("customer")
    db = str(tmp_path / "dst.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE customer (c_custkey INTEGER PRIMARY KEY, c_name TEXT,"
        " c_nationkey INTEGER, c_acctbal REAL, c_mktsegment TEXT)"
    )
    dst_rows = [tuple(r) for r in cust.where(F.col("c_custkey") % 2 == 0).collect()]
    con.executemany("INSERT INTO customer VALUES (?,?,?,?,?)", dst_rows)
    con.commit()
    con.close()

    # destination catalog = parquet snapshot of the sqlite state
    dst_dir = tmp_path / "dstcat"
    spark.createDataFrame(dst_rows, cust.schema).coalesce(1).write.parquet(
        str(dst_dir / "customer.parquet")
    )
    dst_cat = ParquetCatalog(spark, str(dst_dir))

    syncs = sync_tables(catalog, dst_cat, tables=["customer"])
    [s] = syncs
    apply_syncs(
        [s],
        lambda: sqlite3.connect(db),
        columns={"customer": list(cust.columns)},
        quote='"',
    )
    got = sqlite3.connect(db).execute(
        "SELECT * FROM customer ORDER BY c_custkey"
    ).fetchall()
    assert got == sorted(tuple(r) for r in cust.collect())


def test_sync_skips_tables_without_pk(catalog):
    syncs = sync_tables(
        catalog, catalog, tables=["customer"], primary_keys={"customer": []}
    )
    assert syncs == []


def test_guess_primary_key_promotes_best_index():
    rows = [
        # (index_name, seq, column, cardinality, nullable)
        ("idx_a", 1, "col_x", 100, ""),
        ("idx_b", 1, "col_y", 5000, ""),
        ("idx_b", 2, "col_z", 9000, ""),
        ("idx_nullable", 1, "col_n", 99999, "YES"),
    ]
    pk = guess_primary_key(lambda sql: rows, "db", "t")
    assert pk == ["col_y", "col_z"]  # highest non-null cardinality


def test_guess_primary_key_no_usable_index():
    rows = [("idx_nullable", 1, "col_n", 99999, "YES")]
    assert guess_primary_key(lambda sql: rows, "db", "t") == []


def test_dump_manifest_round_trip_verifies(spark, sf_dir, tmp_path):
    """Manifest written at dump time verifies a faithful restore and
    flags a corrupted one."""
    from paradump_spark.catalog import ParquetCatalog
    from paradump_spark.dump import (
        DumpOptions,
        DumpResult,
        dump_tables,
        verify_dump,
        write_manifest,
    )

    cat = ParquetCatalog(spark, sf_dir)
    out = str(tmp_path / "dump")
    results = dump_tables(cat, out, ["nation", "region"], DumpOptions(mode="csv"))
    mpath = write_manifest(cat, out, results)

    ok = verify_dump(cat, mpath)  # source verifies against itself
    assert ok == {"nation": True, "region": True}

    # corrupted restore: nation with a mutated row
    baddir = str(tmp_path / "restored")
    spark.read.parquet(f"{sf_dir}/nation.parquet").withColumn(
        "n_regionkey", F.col("n_regionkey") + 1
    ).write.parquet(f"{baddir}/nation.parquet")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(
        f"{baddir}/region.parquet"
    )
    bad = verify_dump(ParquetCatalog(spark, baddir), mpath)
    assert bad == {"nation": False, "region": True}


def test_checksum_columns_survive_copy(spark, tmp_path):
    """SURVEY §5 cross-engine checksum concept (test/run_test.sh:412-478,
    :785-794): rows carry precomputed hashes of their own payloads; after
    a copy the destination bytes must recompute to the same hashes —
    catching charset/binary mangling in transit.  Here: Spark fixture →
    copy_table → sqlite → recompute both DBAPI-side and Spark-side."""
    import hashlib
    import sqlite3 as sq

    from paradump_spark.sinks.dml import copy_table

    rows = [
        (1, "plain", b"\x00\x01\xff"),
        (2, "with'quote\" and,comma", bytes(range(16))),
        (3, "multi\nline\ttab", b""),
        (4, "unicodé ✓ ♥", b"\xed\xa0\x80\xff"),
    ]
    data = [
        (i, t, b, hashlib.sha256(t.encode("utf-8")).hexdigest(), b.hex())
        for i, t, b in rows
    ]
    schema = (
        "id long, label string, payload binary,"
        " label_sha256 string, payload_hex string"
    )
    df = spark.createDataFrame(data, schema)
    db = str(tmp_path / "cc.db")
    con = sq.connect(db)
    con.execute(
        "CREATE TABLE t (id INTEGER PRIMARY KEY, label TEXT, payload BLOB,"
        " label_sha256 TEXT, payload_hex TEXT)"
    )
    con.commit()
    con.close()
    copy_table(df, lambda: sq.connect(db), "t", quote='"')

    got = sq.connect(db).execute(
        "SELECT id, label, payload, label_sha256, payload_hex FROM t ORDER BY id"
    ).fetchall()
    assert len(got) == len(rows)
    for _id, label, payload, lsha, phex in got:
        assert hashlib.sha256(label.encode("utf-8")).hexdigest() == lsha
        assert bytes(payload or b"").hex() == phex

    # Spark-side recompute over the destination rows (the engine's own
    # hash functions must agree with the carried columns)
    rdf = spark.createDataFrame(
        [(i, l, bytes(p or b""), s, h) for i, l, p, s, h in got], schema
    )
    chk = rdf.select(
        (F.sha2(F.col("label").cast("binary"), 256) == F.col("label_sha256")).alias("a"),
        (F.lower(F.hex("payload")) == F.col("payload_hex")).alias("b"),
    ).collect()
    assert all(r["a"] and r["b"] for r in chk)
