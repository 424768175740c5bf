"""Funnel semantics on crafted event sequences: ordering, window anchor,
greedy-earliest matching, report rollup — plus DuckDB oracle parity with
the independently-implemented chain-of-min SQL."""

import datetime as dt

import duckdb
import pandas as pd
import pytest

from paradump_spark.operators.funnel import (
    funnel_report,
    funnel_users,
    oracle_funnel_report_sql,
    oracle_funnel_users_sql,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(user, minute, typ):
    return (user, T0 + dt.timedelta(minutes=minute), typ)


EVENTS = [
    # user 1: clean A->B->C inside the window
    _ev(1, 0, "A"), _ev(1, 5, "B"), _ev(1, 9, "C"),
    # user 2: B before A -> order violated, only reaches stage 1 via later A
    _ev(2, 0, "B"), _ev(2, 5, "A"),
    # user 3: C outside the 30-min window of the FIRST A (anchor), even
    # though a later A would have worked -> stage 2 only
    _ev(3, 0, "A"), _ev(3, 10, "B"), _ev(3, 50, "C"), _ev(3, 45, "A"),
    # user 4: only step events of other types -> absent entirely
    _ev(4, 0, "X"),
    # user 5: A and B at the SAME timestamp -> B counts (idx ordering)
    _ev(5, 0, "A"), _ev(5, 0, "B"),
]

STEPS = ["A", "B", "C"]
WITHIN = 30 * 60  # 30 minutes


@pytest.fixture()
def ev_df(spark):
    return spark.createDataFrame(
        EVENTS, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_user_semantics(ev_df):
    got = {
        r["user_id"]: r["max_stage"]
        for r in funnel_users(
            ev_df, "user_id", "ts", "event_type", STEPS, WITHIN
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 5: 2}


def test_funnel_report_rollup(ev_df):
    rows = {
        r["stage"]: (r["step"], r["n_users"], r["conversion"])
        for r in funnel_report(
            ev_df, "user_id", "ts", "event_type", STEPS, WITHIN
        ).collect()
    }
    assert rows[1] == ("A", 4, 1.0)
    assert rows[2] == ("B", 3, 0.75)
    assert rows[3] == ("C", 1, 0.25)


def test_funnel_no_window(ev_df):
    # without a window, user 3's late C completes the funnel
    got = {
        r["user_id"]: r["max_stage"]
        for r in funnel_users(
            ev_df, "user_id", "ts", "event_type", STEPS, None
        ).collect()
    }
    assert got[3] == 3


def test_funnel_matches_duckdb_oracle(spark, ev_df):
    con = duckdb.connect()
    con.register(
        "ev_pd",
        pd.DataFrame(EVENTS, columns=["user_id", "ts", "event_type"]),
    )
    con.execute("CREATE VIEW events AS SELECT * FROM ev_pd")
    for fn, osql in (
        (funnel_users, oracle_funnel_users_sql),
        (funnel_report, oracle_funnel_report_sql),
    ):
        a = fn(
            ev_df, "user_id", "ts", "event_type", STEPS, WITHIN
        ).toPandas()
        b = con.execute(
            osql("events", "user_id", "ts", "event_type", STEPS, WITHIN)
        ).df()
        key = "user_id" if "user_id" in a.columns else "stage"
        a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
        b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_funnel_rejects_bad_steps(ev_df):
    with pytest.raises(ValueError):
        funnel_users(ev_df, "user_id", "ts", "event_type", [], 10)
    with pytest.raises(ValueError):
        funnel_users(ev_df, "user_id", "ts", "event_type", ["A", "A"], 10)


def test_funnel_plan_no_python(ev_df):
    plan = funnel_users(
        ev_df, "user_id", "ts", "event_type", STEPS, WITHIN
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_retention_cohorts_semantics(spark):
    from paradump_spark.operators.funnel import retention_cohorts

    rows = [
        # cohort day-0 anchor per user; period length 7 days
        _ev(1, 0, "A"), _ev(1, 7 * 24 * 60, "A"),           # periods 0, 1
        _ev(2, 0, "A"),                                     # period 0 only
        _ev(3, 0, "A"), _ev(3, 15 * 24 * 60, "A"),          # periods 0, 2
        # user 9 starts 30 days later -> different cohort
        _ev(9, 30 * 24 * 60, "A"), _ev(9, 37 * 24 * 60, "A"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (str(r["cohort"]), r["period"]): (r["n_active"], r["retention"])
        for r in retention_cohorts(df, "user_id", "ts", 7, 8).collect()
    }
    cohorts = {c for c, _ in got}
    assert len(cohorts) == 2
    first = min(cohorts)
    assert got[(first, 0)] == (3, 1.0)
    assert got[(first, 1)][0] == 1 and got[(first, 1)][1] == pytest.approx(0.333333)
    assert got[(first, 2)][0] == 1


def test_retention_validates_args(spark):
    from paradump_spark.operators.funnel import retention_cohorts

    df = spark.createDataFrame([], "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        retention_cohorts(df, "user_id", "ts", 0, 8)


def test_event_transitions_semantics(spark):
    from paradump_spark.operators.funnel import event_transitions

    rows = [
        (1, T0 + dt.timedelta(minutes=m), t, i)
        for i, (m, t) in enumerate([(0, "A"), (1, "B"), (2, "A"), (3, "C")])
    ] + [
        (2, T0 + dt.timedelta(minutes=m), t, 100 + i)
        for i, (m, t) in enumerate([(0, "A"), (1, "B")])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transitions(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    # user1: A->B, B->A, A->C ; user2: A->B  => from A: B x2, C x1
    assert got[("A", "B")] == (2, pytest.approx(0.666667))
    assert got[("A", "C")] == (1, pytest.approx(0.333333))
    assert got[("B", "A")] == (1, 1.0)
    assert ("C", "A") not in got  # last events have no successor


def test_funnel_event_cap_keeps_earliest(spark):
    """With a tiny cap the earliest events win deterministically; a
    completed funnel inside the cap is unaffected."""
    from paradump_spark.operators.funnel import funnel_users

    rows = [_ev(1, m, t) for m, t in [(0, "A"), (1, "B"), (2, "C")]]
    rows += [_ev(1, 10 + i, "A") for i in range(20)]  # late noise
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = funnel_users(
        df, "user_id", "ts", "event_type", STEPS, WITHIN,
        max_events_per_user=3,
    ).collect()
    assert got[0]["max_stage"] == 3
    # cap smaller than the funnel: only stages within the kept prefix
    got2 = funnel_users(
        df, "user_id", "ts", "event_type", STEPS, WITHIN,
        max_events_per_user=2,
    ).collect()
    assert got2[0]["max_stage"] == 2
