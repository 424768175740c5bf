"""Gap-based sessionization unit tests."""

import datetime

from paradump_spark.operators.sessionize import session_stats, sessionize


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute, 0)


def test_sessionize_splits_on_gap(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0)), (1, _ts(5)),           # session 1 (gap 5min)
            (1, _ts(50)), (1, _ts(55)),          # session 2 (gap 45min)
            (2, _ts(0)),                         # other user, session 1
        ],
        "user_id bigint, ts timestamp",
    )
    out = sessionize(df, ["user_id"], "ts", gap_seconds=1800)
    got = {
        (r["user_id"], r["ts"].minute): r["session_id"] for r in out.collect()
    }
    assert got == {(1, 0): 1, (1, 5): 1, (1, 50): 2, (1, 55): 2, (2, 0): 1}


def test_session_stats_span(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(5)), (1, _ts(50))],
        "user_id bigint, ts timestamp",
    )
    rows = {
        r["session_id"]: (r["n_events"], r["span_seconds"])
        for r in session_stats(df, ["user_id"], "ts", 1800).collect()
    }
    assert rows == {1: (2, 300), 2: (1, 0)}


def test_sessionize_exact_gap_stays_in_session(spark):
    # gap == gap_seconds is NOT a new session (strict >)
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, datetime.datetime(2024, 1, 1, 10, 30, 0))],
        "user_id bigint, ts timestamp",
    )
    out = sessionize(df, ["user_id"], "ts", gap_seconds=1800)
    assert {r["session_id"] for r in out.collect()} == {1}
