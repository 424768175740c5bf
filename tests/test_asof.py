"""As-of join operator unit tests."""

import datetime

from paradump_spark.catalog import load_events
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


def test_asof_forward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),  # next right: 10:00 (incl)
            (1, _ts("2024-01-01 12:30:00"), "p2"),  # nothing follows
            (2, _ts("2024-01-01 08:00:00"), "p3"),  # next right: 09:00
        ],
        "k bigint, lts timestamp, lname string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 10.0),
            (1, _ts("2024-01-01 12:00:00"), 20.0),
            (2, _ts("2024-01-01 09:00:00"), 30.0),
        ],
        "k bigint, rts timestamp, rv double",
    )
    out = {
        r["lname"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rv"], direction="forward"
        ).collect()
    }
    assert out == {"p1": 10.0, "p2": None, "p3": 30.0}


def test_asof_tolerance_bounds_match_distance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p1"), (1, _ts("2024-01-01 18:00:00"), "p2")],
        "k bigint, lts timestamp, lname string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 10.0)], "k bigint, rts timestamp, rv double"
    )
    out = {
        r["lname"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rv"], tolerance_seconds=2 * 3600
        ).collect()
    }
    # p1 is 1h after the right row (within 2h); p2 is 9h after (too far)
    assert out == {"p1": 10.0, "p2": None}


def test_asof_rejects_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k bigint, lts timestamp")
    with pytest.raises(ValueError):
        asof_join(left, left, ["k"], "lts", "lts", direction="sideways")


def test_asof_forward_matches_bruteforce_on_events(spark, sf_dir):
    """Forward as-of on real events == brute-force min-following-ts join."""
    from pyspark.sql import functions as F

    ev = load_events(spark, f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))  # unique per (key, ts)
        .select("user_id", F.col("ts").alias("cts"), "click_id")
    )
    got = {
        (r["purchase_id"]): r["click_id"]
        for r in asof_join(
            purchases, clicks, ["user_id"], "pts", "cts",
            right_cols=["click_id"], direction="forward",
        ).collect()
    }
    brute = (
        purchases.join(clicks, "user_id")
        .where(F.col("cts") >= F.col("pts"))
        .groupBy("purchase_id")
        .agg(F.min_by("click_id", F.col("cts")).alias("click_id"))
    )
    exp = {r["purchase_id"]: r["click_id"] for r in brute.collect()}
    for pid, cid in exp.items():
        assert got[pid] == cid, pid
    assert all(got[p] is None for p in got.keys() - exp.keys())


def test_asof_tolerance_on_date_columns(spark):
    """Regression: DATE-typed as-of columns must work with tolerance."""
    left = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 10), "p1"), (1, datetime.date(2024, 3, 1), "p2")],
        "k bigint, ld date, lname string",
    )
    right = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 8), 5.0)], "k bigint, rd date, rv double"
    )
    out = {
        r["lname"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "ld", "rd", ["rv"],
            tolerance_seconds=7 * 86400,
        ).collect()
    }
    assert out == {"p1": 5.0, "p2": None}  # 2 days in, 53 days out
