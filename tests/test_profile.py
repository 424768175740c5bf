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
