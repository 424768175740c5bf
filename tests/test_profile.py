"""Table profiler: values, approx mode, and the single-scan plan shape."""

from pyspark.sql import functions as F

from paradump_spark.operators.profile import profile_table


def test_profile_values_and_subset(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    prof = {r["column_name"]: r for r in profile_table(cust, ["c_custkey", "c_mktsegment"]).collect()}
    assert set(prof) == {"c_custkey", "c_mktsegment"}
    assert prof["c_custkey"]["n_nulls"] == 0
    assert prof["c_custkey"]["n_distinct"] == cust.count()
    mn = cust.agg(F.min("c_custkey")).collect()[0][0]
    assert prof["c_custkey"]["min_text"] == str(mn)
    segs = cust.select("c_mktsegment").distinct().count()
    assert prof["c_mktsegment"]["n_distinct"] == segs


def test_profile_approx_mode_close(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r["column_name"]: r["n_distinct"]
        for r in profile_table(orders, ["o_custkey"]).collect()
    }
    approx = {
        r["column_name"]: r["n_distinct"]
        for r in profile_table(orders, ["o_custkey"], exact_distinct=False).collect()
    }
    e, a = exact["o_custkey"], approx["o_custkey"]
    assert abs(a - e) / e < 0.1  # sketch within 10%


def test_profile_is_single_scan(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = profile_table(orders, exact_distinct=False)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 1
    assert "partial" in p  # map-side combine before the 1-row reduce


def test_sketch_profile_merge_matches_whole_table(spark, sf_dir):
    """Per-batch sketches unioned == whole-table profile (counts exact,
    distinct estimates within HLL error of the exact answer)."""
    from pyspark.sql import functions as F

    from paradump_spark.operators.profile import (
        merge_sketch_profiles,
        profile_table,
        sketch_profile,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.where(F.col("o_orderkey") % 2 == 0)
    b = orders.where(F.col("o_orderkey") % 2 != 0)
    merged = merge_sketch_profiles(
        sketch_profile(a).unionAll(sketch_profile(b))
    )
    got = {r["column_name"]: r for r in merged.collect()}
    exact = {
        r["column_name"]: r for r in profile_table(orders).collect()
    }
    n = orders.count()
    for c, row in got.items():
        assert row["n_rows"] == n
        assert row["n_nulls"] == exact[c]["n_nulls"]
        nd = exact[c]["n_distinct"]
        # lgk=12 HLL: ~1.6% relative standard error; allow 5%
        assert abs(row["n_distinct_est"] - nd) <= max(3, 0.05 * nd), c


def test_sketch_profile_sketch_is_small_and_rebatchable(spark):
    """A sketch row is KB-scale and a third batch folds into a previous
    merge result only via re-union of sketches (no estimate arithmetic)."""
    from paradump_spark.operators.profile import (
        merge_sketch_profiles,
        sketch_profile,
    )

    d1 = spark.range(0, 5000).selectExpr("id as k")
    d2 = spark.range(2500, 7500).selectExpr("id as k")
    sk = sketch_profile(d1).unionAll(sketch_profile(d2))
    assert max(len(r["dist_sketch"]) for r in sk.collect()) < 64 * 1024
    est = merge_sketch_profiles(sk).collect()[0]["n_distinct_est"]
    assert abs(est - 7500) <= 0.05 * 7500
