"""Streaming drift monitor (streaming/documents.py:drift_monitor_stream)."""

import shutil

import pytest
from pyspark.sql import functions as F

from paradump_spark.catalog import load_events
from paradump_spark.operators.drift import histogram, psi_value
from paradump_spark.streaming.documents import drift_monitor_stream
from paradump_spark.streaming.events import read_event_stream


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_psi_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """One micro-batch over the whole file == batch psi_value with the
    same baseline."""
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    baseline = {
        r["bin"]: r["n_rows"]
        for r in histogram(ev, "value", 0.0, 500.0, 10).collect()
    }
    reports = []
    stream = read_event_stream(spark, events_dir)
    q = drift_monitor_stream(
        stream,
        baseline,
        "value",
        0.0,
        500.0,
        10,
        on_report=lambda bid, psi, rows: reports.append((bid, psi, rows)),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    q.stop()
    assert len(reports) == 1
    _, psi, rows = reports[0]
    # stream vs itself-as-baseline: PSI ~ 0
    assert abs(psi) < 1e-6
    assert len(rows) == 10
    # batch reference computes the identical number
    want = psi_value(ev, ev, "value", 0.0, 500.0, 10)
    assert psi == pytest.approx(round(want, 6), abs=1e-6)


def test_stream_flags_shifted_batch(spark, sf_dir, events_dir, tmp_path):
    """A baseline from a DIFFERENT distribution drives PSI above the
    drift band."""
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    shifted = ev.select((F.col("value") + 300.0).alias("value"))
    baseline = {
        r["bin"]: r["n_rows"]
        for r in histogram(shifted, "value", 0.0, 500.0, 10).collect()
    }
    reports = []
    stream = read_event_stream(spark, events_dir)
    q = drift_monitor_stream(
        stream,
        baseline,
        "value",
        0.0,
        500.0,
        10,
        on_report=lambda bid, psi, rows: reports.append(psi),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    q.stop()
    assert reports and reports[0] > 0.25
