"""Structured Streaming tests: availableNow triggers over the static
events parquet, memory sink assertions, stateful operator, foreachBatch
sync."""

import shutil
import uuid

from paradump_spark.catalog import load_events
import pytest
from pyspark.sql import functions as F

from paradump_spark.streaming import (
    hourly_event_counts,
    read_event_stream,
    running_user_totals,
    stream_sync_to_sink,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """Copy events.parquet into a directory layout a file stream can watch."""
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def _run_to_memory(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_counts_match_batch(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    # complete mode: append would hold back windows still inside the
    # watermark horizon (they only finalize once later data arrives)
    q = _run_to_memory(hourly_event_counts(stream), name, "complete")
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    q.stop()
    # batch reference
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    exp = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert got == exp


def test_running_user_totals_state(spark, events_dir, sf_dir):
    stream = read_event_stream(spark, events_dir)
    name = f"running_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(running_user_totals(stream), name, "update")
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            f"SELECT user_id, last(n_events) n_events, last(total_value) total_value"
            f" FROM {name} GROUP BY user_id"
        ).collect()
    }
    q.stop()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exp = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == exp


def test_foreach_batch_sync(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    seen = {"rows": 0, "batches": 0}

    def apply_batch(batch_df, batch_id):
        seen["rows"] += batch_df.count()
        seen["batches"] += 1

    q = stream_sync_to_sink(stream, apply_batch, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    q.stop()
    assert seen["rows"] == 1000 and seen["batches"] >= 1


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, events_dir, tmp_path):
    """Duplicate the input file so real duplicates arrive; the stream must
    emit each event_id exactly once, equal to the batch distinct set."""
    import shutil as _sh

    from paradump_spark.streaming import dedup_event_stream

    _sh.copy(f"{sf_dir}/events.parquet", f"{events_dir}/part-001.parquet")
    stream = read_event_stream(spark, events_dir)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(dedup_event_stream(stream), name, "append")
    got = [r["event_id"] for r in spark.sql(f"SELECT event_id FROM {name}").collect()]
    q.stop()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    exp = {
        r["event_id"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .collect()
    }
    assert len(got) == len(set(got)) == len(exp)  # once each, none lost
    assert set(got) == exp


def test_stream_stream_join_matches_batch(spark, sf_dir, events_dir):
    from paradump_spark.streaming import purchase_click_stream_join

    stream = read_event_stream(spark, events_dir)
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(purchase_click_stream_join(stream), name, "append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    q.stop()
    # batch reference: same interval join on the static table
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    exp = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") >= F.col("pts"))
            & (F.col("cts") <= F.col("pts") + F.expr("INTERVAL 3600 SECONDS")),
        ).collect()
    }
    assert got == exp and len(exp) > 0


def test_running_user_totals_tws_matches_batch(spark, events_dir, sf_dir):
    """transformWithStateInPandas path == batch groupBy (and therefore ==
    the applyInPandasWithState path, tested above).

    Guarded like tests/test_live_mysql.py: the TWS driver worker needs
    the protobuf package, which this container lacks — the operator is
    the documented forward path, the GroupState twin above is the one
    provable here."""
    pytest.importorskip("google.protobuf")
    from paradump_spark.streaming.events import running_user_totals_tws

    saved = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, events_dir)
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = _run_to_memory(running_user_totals_tws(stream), name, "update")
        rows = spark.sql(
            f"SELECT * FROM {name} QUALIFY row_number() OVER "
            "(PARTITION BY user_id ORDER BY n_events DESC) = 1"
        ).collect()
        q.stop()
        got = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 6))
            for r in rows
        }
        ev = load_events(spark, f"{sf_dir}/events.parquet")
        exp = {
            r["user_id"]: (r["n"], round(r["t"], 6))
            for r in ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
            .collect()
        }
        assert got == exp
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
