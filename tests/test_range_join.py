"""Range-join operator tests: equivalence to the naive theta condition +
no cartesian in the plan."""

import datetime

from paradump_spark.catalog import load_events
import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.rangejoin import range_join


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_range_join_basic_window(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(0)), (1, 101, _ts(30))], "k bigint, lid bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 200, _ts(0, 30)),   # 30s after lid=100 -> match
            (1, 201, _ts(5)),       # 5min after lid=100 -> match (<=10min)
            (1, 202, _ts(20)),      # 20min after 100 (no), 10min before 101 (no: after-only)
            (1, 203, _ts(31)),      # 1min after lid=101 -> match
            (2, 204, _ts(1)),       # other key
        ],
        "k bigint, rid bigint, ts timestamp",
    )
    out = range_join(left, right, "ts", "ts", after_seconds=600, on=["k"])
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(100, 200), (100, 201), (101, 203)]


def test_range_join_before_window_and_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, 1, _ts(5)), (1, 2, _ts(10)), (1, 3, _ts(15)), (1, 4, _ts(16, 1))],
        "k bigint, rid bigint, ts2 timestamp",
    )
    out = range_join(
        left, right, "ts", "ts2", after_seconds=360, before_seconds=300, on=["k"]
    )
    # [10:05:00, 10:16:00] inclusive -> rids 1,2,3 (4 is 16:01, outside)
    assert sorted(r["rid"] for r in out.collect()) == [1, 2, 3]


def test_range_join_matches_naive_theta(spark, sf_dir):
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    p = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("pid"), "ts"
    )
    c = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    fast = {
        (r["pid"], r["cid"])
        for r in range_join(p, c, "ts", "cts", after_seconds=7200, on=["user_id"]).collect()
    }
    naive = {
        (r["pid"], r["cid"])
        for r in p.join(c, "user_id")
        .where(
            (F.col("cts").cast("long") >= F.col("ts").cast("long"))
            & (F.col("cts").cast("long") <= F.col("ts").cast("long") + 7200)
        )
        .collect()
    }
    assert fast == naive


def test_range_join_rejects_empty_window(spark):
    with pytest.raises(ValueError):
        range_join(None, None, "a", "b", after_seconds=0)


def test_range_join_plan_is_equi_join(spark, sf_dir):
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    p = ev.select("user_id", F.col("event_id").alias("pid"), "ts")
    c = ev.select("user_id", F.col("event_id").alias("cid"), F.col("ts").alias("cts"))
    out = range_join(p, c, "ts", "cts", after_seconds=3600, on=["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
