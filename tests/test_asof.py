"""As-of join operator unit tests."""

import datetime

from paradump_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),
            (1, _ts("2024-01-01 12:00:00"), "p2"),
            (2, _ts("2024-01-01 09:00:00"), "p3"),
        ],
        "k bigint, lts timestamp, lname string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 12:00:00"), 20.0),  # equal ts -> inclusive
            (2, _ts("2024-01-01 10:00:00"), 30.0),  # after the only probe
        ],
        "k bigint, rts timestamp, rv double",
    )
    out = {
        r["lname"]: r["rv"]
        for r in asof_join(left, right, ["k"], "lts", "rts", ["rv"]).collect()
    }
    assert out == {"p1": 10.0, "p2": 20.0, "p3": None}


def test_asof_no_right_rows_yields_nulls(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k bigint, lts timestamp")
    right = spark.createDataFrame([], "k bigint, rts timestamp, rv double")
    [row] = asof_join(left, right, ["k"], "lts", "rts", ["rv"]).collect()
    assert row["rv"] is None


def test_asof_column_collision_suffix(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 5.0)], "k bigint, t timestamp, v double")
    right = spark.createDataFrame([(1, _ts("2024-01-01 09:00:00"), 7.0)], "k bigint, t2 timestamp, v double")
    [row] = asof_join(left, right, ["k"], "t", "t2", ["v"]).collect()
    assert row["v"] == 5.0 and row["v_right"] == 7.0
