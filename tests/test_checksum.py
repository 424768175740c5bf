"""Chunk checksums + two-phase incremental diff."""

from pyspark.sql import functions as F

from paradump_spark.operators.checksum import (
    changed_chunks,
    chunk_checksums,
    incremental_diff,
    table_checksum,
)
from paradump_spark.operators.diff import diff_classified
from paradump_spark.plans.split import plan_chunks


def _perturb(orders):
    """Bump one narrow key range so only chunks covering it change."""
    return orders.withColumn(
        "o_totalprice",
        F.when(
            (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 120),
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")),
    )


def test_identical_tables_have_no_changed_chunks(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    chunks = plan_chunks(orders, ["o_orderkey"], 16)
    assert changed_chunks(orders, orders, chunks, ["o_orderkey"]) == []
    a = table_checksum(orders).collect()[0]
    b = table_checksum(orders).collect()[0]
    assert (a["n_rows"], a["hash_sum"]) == (b["n_rows"], b["hash_sum"])


def test_changed_chunks_localize_the_perturbation(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dst = _perturb(orders)
    chunks = plan_chunks(orders, ["o_orderkey"], 16)
    dirty = changed_chunks(orders, dst, chunks, ["o_orderkey"])
    assert 0 < len(dirty) < len(chunks)  # found it, and localized it
    # checksum totals per chunk must conserve rows
    cs = chunk_checksums(orders, chunks, ["o_orderkey"])
    assert cs.agg(F.sum("n_rows")).collect()[0][0] == orders.count()


def test_incremental_diff_equals_full_diff(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dst = _perturb(orders).where(F.col("o_orderkey") % 97 != 3)  # + deletes
    inc = {
        (r["o_orderkey"], r["dmltype"])
        for r in incremental_diff(orders, dst, ["o_orderkey"], 16).collect()
    }
    full = {
        (r["o_orderkey"], r["dmltype"])
        for r in diff_classified(orders, dst, ["o_orderkey"]).collect()
    }
    assert inc == full and len(full) > 0


def test_incremental_diff_catches_null_pk_rows(spark):
    src = spark.createDataFrame(
        [(1, "a"), (None, "x")], "k bigint, v string"
    )
    dst = spark.createDataFrame(
        [(1, "a"), (None, "CHANGED")], "k bigint, v string"
    )
    out = incremental_diff(src, dst, ["k"], 4).collect()
    assert {r["dmltype"] for r in out} == {"U"} and len(out) == 1


def test_row_signature_distinguishes_null_from_literal(spark):
    from paradump_spark.operators.checksum import row_signature

    df = spark.createDataFrame(
        [("NULL", "b"), (None, "b"), ("a", None), ("aNULL", None)],
        "x string, y string",
    )
    sigs = [r[0] for r in df.select(row_signature(["x", "y"])).collect()]
    assert len(set(sigs)) == 4  # no collisions across NULL-marker shapes


def test_row_signature_cell_framing_unforgeable(spark):
    """A value containing the separator + marker bytes must not shift
    content across cell boundaries: ('a\\x00vb','c') vs ('a','b\\x00vc')
    rendered identical images before the escape fix."""
    from paradump_spark.operators.checksum import row_signature

    df = spark.createDataFrame(
        [("a\x00vb", "c"), ("a", "b\x00vc"), ("a\x01", "b"), ("a", "\x01b")],
        "x string, y string",
    )
    sigs = [r[0] for r in df.select(row_signature(["x", "y"])).collect()]
    assert len(set(sigs)) == 4


def test_sync_incremental_mode_matches_full(spark, sf_dir, tmp_path):
    """sync_tables(incremental_chunks=N) reports the same I/U/D counts as
    the classic full-diff path."""
    from paradump_spark.catalog import ParquetCatalog
    from paradump_spark.sync import SyncOptions, sync_report, sync_tables

    src = ParquetCatalog(spark, sf_dir)
    # build a perturbed destination catalog on disk
    dstdir = str(tmp_path / "dst")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _perturb(orders).where(F.col("o_orderkey") % 101 != 7).write.parquet(
        f"{dstdir}/orders.parquet"
    )
    dst = ParquetCatalog(spark, dstdir)

    def counts(opts):
        syncs = sync_tables(src, dst, tables=["orders"], options=opts)
        return {
            (r["action"]): r["cnt"]
            for r in sync_report(syncs).collect()
            if r["action"] in ("Insert", "Update", "Delete")
        }

    full = counts(SyncOptions(keep_noops_in_stats=False))
    inc = counts(SyncOptions(keep_noops_in_stats=False, incremental_chunks=16))
    assert inc == full and sum(full.values()) > 0


def test_identical_null_pk_rows_are_not_dirty(spark):
    """Regression: the NULL-PK pseudo-chunk must checksum-MATCH across
    sides (sentinel join key), not be re-diffed on every run."""
    df = spark.createDataFrame([(1, "a"), (None, "x")], "k bigint, v string")
    assert incremental_diff(df, df, ["k"], 4).count() == 0


def test_binary_tree_chunk_assignment_equals_linear(spark, sf_dir):
    """The O(log n) search tree assigns every row the same chunk as the
    linear predicate chain."""
    from paradump_spark.operators.checksum import _chunk_id_expr, _is_contiguous
    from paradump_spark.plans.split import chunk_filter

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pk = ["l_orderkey", "l_linenumber"]
    chunks = plan_chunks(li, pk, 16)
    assert _is_contiguous(chunks)

    tree = _chunk_id_expr(chunks, pk, li.schema)
    cid = None
    for ch in chunks:
        cond = chunk_filter(ch, pk, li.schema)
        cid = F.when(cond, F.lit(ch.chunk_id)) if cid is None else cid.when(
            cond, F.lit(ch.chunk_id)
        )
    linear = F.coalesce(cid, F.lit(-1))
    mismatches = (
        li.select(tree.alias("t"), linear.alias("l"))
        .where(F.col("t") != F.col("l"))
        .count()
    )
    assert mismatches == 0
