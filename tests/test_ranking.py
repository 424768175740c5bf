"""Distributed exact global ranking (plans/ranking.py): bit-parity
with the naive single-partition window across shapes, and the plan
guarantee (no SinglePartition exchange feeding the window)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from paradump_spark.plans.ranking import global_ntile, global_row_number


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_row_number_matches_window(spark, sf_dir):
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    got = {
        r["o_orderkey"]: r["rn"]
        for r in global_row_number(
            o, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
        ).collect()
    }
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    want = {
        r["o_orderkey"]: r["rn"]
        for r in o.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_buckets", [1, 3, 4, 7])
def test_ntile_matches_window(spark, sf_dir, n_buckets):
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    got = {
        r["o_orderkey"]: r["bucket"]
        for r in global_ntile(o, n_buckets, order).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["o_orderkey"]: r["bucket"]
        for r in o.withColumn(
            "bucket", F.ntile(n_buckets).over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_ntile_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 3.0)], "id long, v double")
    got = {
        r["id"]: r["bucket"]
        for r in global_ntile(df, 10, [F.col("v").asc(), F.col("id").asc()]).collect()
    }
    assert got == {2: 1, 1: 2}


def test_empty_frame(spark):
    df = spark.createDataFrame([], "id long, v double")
    assert global_row_number(df, [F.col("v").asc()]).count() == 0
    assert global_ntile(df, 4, [F.col("v").asc()]).count() == 0


def test_ties_break_deterministically(spark):
    rows = [(i, 1.0) for i in range(100)]  # all tied on v
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(
            df, [F.col("v").asc(), F.col("id").asc()]
        ).collect()
    }
    assert got == {i: i + 1 for i in range(100)}


def test_no_single_partition_window_in_plan(spark, sf_dir):
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    df = global_ntile(
        o, 4, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" in line:
            below = "\n".join(lines[i + 1 : i + 4])
            assert "Exchange SinglePartition" not in below, plan


def test_percent_rank_matches_window(spark, sf_dir):
    from paradump_spark.plans.ranking import global_percent_rank

    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    order = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    got = {
        r["o_orderkey"]: r["pct_rank"]
        for r in global_percent_rank(o, order).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["o_orderkey"]: r["p"]
        for r in o.withColumn("p", F.percent_rank().over(w)).collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_percent_rank_single_row(spark):
    from paradump_spark.plans.ranking import global_percent_rank

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    r = global_percent_rank(df, [F.col("v").asc(), F.col("id").asc()]).collect()
    assert r[0]["pct_rank"] == 0.0


# ---------------------------------------------------------------------------
# rank / dense_rank / tie-aware percent_rank (round 6): parity with the
# naive window on a frame with heavy duplicate keys.


def _dup_frame(spark):
    # o_orderdate-style heavy ties + a NULL key group
    rows = [(i, ["a", "b", "b", None, "c", "a", "b"][i % 7]) for i in range(200)]
    return spark.createDataFrame(rows, "id long, k string")


def test_rank_matches_window_under_ties(spark):
    from paradump_spark.plans.ranking import global_rank

    df = _dup_frame(spark)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(
            df, [F.col("k").asc()], [F.col("k")]
        ).collect()
    }
    w = Window.orderBy(F.col("k").asc())
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.rank().over(w).cast("long")).collect()
    }
    assert got == want


def test_dense_rank_matches_window_under_ties(spark):
    from paradump_spark.plans.ranking import global_dense_rank

    df = _dup_frame(spark)
    got = {
        r["id"]: r["dense_rank"]
        for r in global_dense_rank(
            df, [F.col("k").desc()], [F.col("k")]
        ).collect()
    }
    w = Window.orderBy(F.col("k").desc())
    want = {
        r["id"]: r["dense_rank"]
        for r in df.withColumn(
            "dense_rank", F.dense_rank().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_percent_rank_exact_under_ties(spark):
    from paradump_spark.plans.ranking import global_percent_rank

    df = _dup_frame(spark)
    got = {
        r["id"]: r["pct_rank"]
        for r in global_percent_rank(
            df, [F.col("k").asc()], tie_cols=[F.col("k")]
        ).collect()
    }
    w = Window.orderBy(F.col("k").asc())
    want = {
        r["id"]: r["pr"]
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got == want  # exact float equality: same (rank-1)/(total-1)


def test_rank_on_orders_date_ties(spark, sf_dir):
    """Real-data parity: orders ranked by date (thousands of ties/day)."""
    from paradump_spark.plans.ranking import global_dense_rank, global_rank

    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderdate")
    got = {
        (r["o_orderkey"]): (r["rank"], r["dense_rank"])
        for r in global_dense_rank(
            global_rank(o, [F.col("o_orderdate").asc()], ["o_orderdate"]),
            [F.col("o_orderdate").asc()],
            ["o_orderdate"],
        ).collect()
    }
    w = Window.orderBy(F.col("o_orderdate").asc())
    want = {
        r["o_orderkey"]: (r["rank"], r["dense_rank"])
        for r in o.withColumn("rank", F.rank().over(w).cast("long"))
        .withColumn("dense_rank", F.dense_rank().over(w).cast("long"))
        .collect()
    }
    assert got == want


def test_rank_no_single_partition_window_in_plan(spark, sf_dir):
    from paradump_spark.plans.ranking import global_dense_rank

    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderdate")
    plan = (
        global_dense_rank(o, [F.col("o_orderdate").asc()], ["o_orderdate"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
