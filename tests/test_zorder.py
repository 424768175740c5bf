"""Z-order layout: Morton-code math vs a Python reference, row
conservation, and the actual payoff — fewer files touched by a filter on
the SECOND clustered column than a linear sort gives."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from paradump_spark.plans.zorder import file_overlap_count, zorder_write, zvalue


def _morton_py(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_python_morton(spark):
    # ids 0..2^b-1 on both axes -> min/max scaling is identity
    b = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zvalue(df, ["x", "y"], bits=b)).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y, b), (x, y)


def test_zvalue_rejects_overflow(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        zvalue(df, ["a", "b"], bits=32)


def test_zorder_write_skips_files_on_second_dim(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    tmp = tempfile.mkdtemp(prefix="zorder_")
    try:
        zpath, lpath = f"{tmp}/z", f"{tmp}/linear"
        zorder_write(li, zpath, ["l_orderkey", "l_partkey"], num_files=16)
        # baseline: the classic single-key clustered layout
        (
            li.repartitionByRange(16, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        assert spark.read.parquet(zpath).count() == n  # row conservation

        # narrow predicate on the SECONDARY dimension: Z layout keeps
        # l_partkey locality, linear-by-orderkey scatters it everywhere
        hi = li.agg(F.max("l_partkey")).collect()[0][0]
        lo_bound, hi_bound = 1, max(1, hi // 16)
        z_files = file_overlap_count(spark, zpath, "l_partkey", lo_bound, hi_bound)
        l_files = file_overlap_count(spark, lpath, "l_partkey", lo_bound, hi_bound)
        assert z_files < l_files, (z_files, l_files)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zvalue_supports_date_and_timestamp_columns(spark, sf_dir):
    """Regression: temporal columns must z-order via their epoch forms."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_date", F.to_date("o_orderdate")
    )
    z = zvalue(orders, ["o_date", "o_custkey"], bits=8)
    n = orders.withColumn("z", z).where(F.col("z").isNotNull()).count()
    assert n == orders.count()
    z2 = zvalue(orders, ["o_orderdate", "o_custkey"], bits=8)  # timestamp
    assert orders.withColumn("z", z2).where(F.col("z").isNotNull()).count() == n


def test_compaction_reduces_files_and_preserves_content(spark, sf_dir, tmp_path):
    from paradump_spark.operators.checksum import table_checksum
    from paradump_spark.plans.zorder import compact_parquet

    # simulate append decay: 24 tiny files
    p = str(tmp_path / "decayed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(24).write.parquet(p)
    import glob

    before_files = len(glob.glob(f"{p}/*.parquet"))
    assert before_files >= 24
    before = table_checksum(spark.read.parquet(p)).collect()[0]

    n = compact_parquet(spark, p, target_mb=512, sort_col="o_orderkey")
    after_files = len(glob.glob(f"{p}/*.parquet"))
    assert after_files == n < before_files
    after = table_checksum(spark.read.parquet(p)).collect()[0]
    # content-identical rewrite, proven by the order-insensitive checksum
    assert (before["n_rows"], before["hash_sum"]) == (after["n_rows"], after["hash_sum"])


def test_compaction_preserves_partition_layout_and_sidecars(spark, sf_dir, tmp_path):
    """Compacting the band-partitioned signature store keeps band_idx
    directories (pruning intact) and the params sidecar."""
    import os

    from paradump_spark.operators.dedup import write_signature_store
    from paradump_spark.plans.zorder import compact_parquet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    store = str(tmp_path / "store")
    write_signature_store(docs, store, "doc_id", "text")
    # decay: several appends
    for i in range(3):
        shard = docs.where(F.col("doc_id") % 7 == i).select(
            (F.col("doc_id") + 10000 * (i + 1)).alias("doc_id"), "text"
        )
        from paradump_spark.operators.dedup import minhash_signatures
        from paradump_spark.functions.text import lsh_band_hashes

        sigs = minhash_signatures(shard, "doc_id", "text")
        sigs.select(
            "doc_id", F.posexplode(lsh_band_hashes(F.col("sig"), 4, 3)).alias("band_idx", "band_hash")
        ).write.mode("append").partitionBy("band_idx").parquet(store)

    before = spark.read.parquet(store)
    n_before = before.count()
    compact_parquet(spark, store, target_mb=512, partition_by=["band_idx"])

    assert os.path.isdir(f"{store}/band_idx=0")  # layout preserved
    assert os.path.exists(f"{store}/_sig_params.json")  # sidecar carried
    after = spark.read.parquet(store)
    assert after.count() == n_before
    # partition pruning still works on the compacted store
    p = after.where(F.col("band_idx") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p
    assert "band_idx" in p.split("PartitionFilters")[1][:120]


# --- Hilbert curve ----------------------------------------------------------


def _xy2d_ref(n, x, y):
    """Public-domain reference xy2d."""
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hvalue_matches_python_reference(spark):
    import random

    from paradump_spark.plans.zorder import hvalue

    random.seed(7)
    bits = 8
    n = 1 << bits
    pts = [(random.randrange(n), random.randrange(n)) for _ in range(300)]
    # identity normalization: feed grid coords whose min/max span [0, n-1]
    pts += [(0, 0), (n - 1, n - 1), (0, n - 1), (n - 1, 0)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", hvalue(df, ["x", "y"], bits).alias("d")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(n, x, y), (x, y)


def test_hvalue_is_bijective_and_adjacent(spark):
    """On a full 16x16 grid the Hilbert index is a bijection onto
    [0, 256) and every consecutive pair of cells is grid-adjacent —
    the locality property Morton lacks."""
    from paradump_spark.plans.zorder import hvalue

    bits = 4
    n = 1 << bits
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", hvalue(df, ["x", "y"], bits).alias("d")).collect()
    by_d = {r["d"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(n * n))
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = by_d[d - 1], by_d[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_zorder_write_hilbert_roundtrip(spark, sf_dir, tmp_path):
    from paradump_spark.plans.zorder import zorder_write

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "hz")
    zorder_write(li, out, ["l_orderkey", "l_partkey"], num_files=4, curve="hilbert")
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0

    import pytest

    with pytest.raises(ValueError):
        zorder_write(li, out, ["l_orderkey"], curve="hilbert")
    with pytest.raises(ValueError):
        zorder_write(li, out, ["l_orderkey", "l_partkey"], curve="peano")
