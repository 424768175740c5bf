"""JSON props extraction + streaming sessionization."""

import shutil
import uuid

import duckdb
import pytest
from pyspark.sql import functions as F

from paradump_spark.catalog import load_events
from paradump_spark.operators.props import extract_props, props_field_stats
from paradump_spark.streaming import read_event_stream, session_rollup_stream


# ------------------------------------------------------------------- props

def test_extract_props_typed_and_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, '{"k": "not an int"}'),
            (3, "not json at all"),
            (4, None),
            (5, '{"other": 1}'),
        ],
        "id long, props string",
    )
    out = extract_props(df, "props", {"k": "int"})
    got = {r.id: r.k for r in out.collect()}
    assert got == {1: 7, 2: None, 3: None, 4: None, 5: None}
    assert "props" not in out.columns
    assert "props" in extract_props(df, keep_raw=True).columns


def test_extract_props_no_python_in_plan(spark, sf_dir):
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    plan = (
        extract_props(ev, "props", {"k": "int"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_props_field_stats_matches_duckdb(spark, sf_dir):
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    got = {
        r.event_type: (r.n_rows, r.n_present, r.avg_val, r.min_val, r.max_val)
        for r in props_field_stats(ev, "event_type").collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(f"""
            SELECT event_type, count(*),
                   count(try_cast(json_extract_string(props, '$.k') AS INT)),
                   round(avg(try_cast(json_extract_string(props, '$.k') AS INT)), 6),
                   min(try_cast(json_extract_string(props, '$.k') AS INT)),
                   max(try_cast(json_extract_string(props, '$.k') AS INT))
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type
        """).fetchall()
    }
    assert got == want


# ------------------------------------------------- streaming sessionization

@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_sessions_match_batch_session_window(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        session_rollup_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): (r.n_events, r.span_seconds)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    q.stop()
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "1800 seconds").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    want = {
        # span is floor(end)-floor(start), matching the operator's
        # cast("long") per-timestamp truncation
        (r.user_id, r.session_start): (
            r.n_events,
            int(r.session_end.timestamp() // 1) - int(r.session_start.timestamp() // 1),
        )
        for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0
