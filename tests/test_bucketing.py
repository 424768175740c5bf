"""Bucketed co-located join: correctness + the exchange-free plan."""

from pyspark.sql import functions as F

from paradump_spark.plans.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_is_exchange_free_and_correct(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the big-table strategy (SMJ); broadcast would hide the
        # co-location property this test asserts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point: co-located layout -> no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan

        expected = orders.join(li, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_bucketed_aggregation_avoids_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders, "b_orders2", ["o_custkey"], 8)
    agg = (
        spark.table("b_orders2")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == orders.select("o_custkey").distinct().count()
    spark.sql("DROP TABLE b_orders2")
