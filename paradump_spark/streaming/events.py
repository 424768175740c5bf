"""Streaming operators over an append-only events table.

Patterns (all Spark-native, no reference analogue — SURVEY §2.10):

* file-source stream with explicit schema (new parquet files appear →
  new micro-batch; at 100 TB this is the landing-zone pattern),
* watermark + tumbling-window aggregation (late data handled by the
  watermark, state bounded),
* ``applyInPandasWithState`` custom stateful operator (running per-key
  accumulator with explicit GroupState),
* ``foreachBatch`` diff-apply: each micro-batch full-outer-diffs against
  the destination and applies only the DML delta — parasync as a
  continuous pipeline.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Default stream schema (current testdata: parquet timestamp[us], no UTC
# adjust → TIMESTAMP_NTZ).  `read_event_stream` sniffs the actual files.
EVENT_SCHEMA = _event_schema(T.TimestampNTZType())


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory; ``ts`` → TIMESTAMP.

    A file stream needs a declared schema, but the driver's events parquet
    has shipped ``ts`` as TIMESTAMP(NANOS), timestamp[us]-NTZ, and
    TIMESTAMP across rounds — so sniff one footer via the batch reader and
    declare the matching stream schema, then normalize exactly like
    `paradump_spark.catalog.load_events` does for batch."""
    # scoped conf flip (same contract as catalog.load_events): restore
    # the session's previous value so later parquet reads are untouched
    saved = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_field = None
    try:
        ts_field = [
            f for f in spark.read.parquet(path).schema.fields if f.name == "ts"
        ][0]
    finally:
        # the nanos branch still needs the conf at micro-batch scan time,
        # so only restore when the files are NOT TIMESTAMP(NANOS)
        if ts_field is None or not isinstance(ts_field.dataType, T.LongType):
            if saved is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", saved)
    raw = (
        spark.readStream.schema(_event_schema(ts_field.dataType))
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )
    if isinstance(ts_field.dataType, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_field.dataType, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window rollup: (window, event_type, n, sum).

    The watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted — the standard late-data design.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) across
    micro-batches via ``applyInPandasWithState`` — the extension point for
    operators Spark's built-ins can't express (sessionization, CDC
    dedupe, feature accumulation)."""

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sync_to_sink(
    events: DataFrame,
    apply_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """CDC-style continuous sync: each micro-batch is handed to
    ``apply_batch`` (e.g. diff against the destination + sinks.dml.apply_diff)
    under exactly-once foreachBatch semantics with checkpointing."""
    writer = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_event_stream(
    events: DataFrame, id_col: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each seen key only until the
    watermark passes it, so state size tracks the duplicate-arrival window
    — not the whole stream history (which plain ``dropDuplicates`` on an
    unbounded stream would)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


def session_rollup_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-based sessionization via the built-in
    ``session_window`` aggregation: per-user sessions close when no
    event arrives within ``gap_seconds``; the watermark finalizes and
    evicts sessions once event time passes their close + gap, so state
    is bounded by the number of OPEN sessions, not stream history.

    Same rollup shape as the batch ``operators.sessionize.session_stats``
    (n_events, start, end, span) — the stream==batch equality test pins
    the two formulations to each other.
    """
    win = F.session_window("ts", f"{gap_seconds} seconds")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "n_events",
            "session_start",
            "session_end",
            (
                F.col("session_end").cast("long")
                - F.col("session_start").cast("long")
            ).alias("span_seconds"),
        )
    )


def purchase_click_stream_join(
    events: DataFrame,
    within_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the following ``within_seconds``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can compute how long to buffer each side and evict
    — the canonical bounded-state stream-stream join shape.
    """
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {within_seconds} SECONDS"))
    )
    return purchases.join(clicks, cond, "inner").select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id", "p_ts", "c_ts"
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """`running_user_totals` re-expressed on ``transformWithStateInPandas``
    (Spark 4 arbitrary-state API): typed ValueState instead of a packed
    tuple, explicit processor lifecycle, and room for timers/TTL that
    ``applyInPandasWithState`` cannot express.  Requires the RocksDB
    state store provider::

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider")

    Both implementations are kept: the GroupState one runs on any state
    store (and is the one provable in this container — the TWS driver
    worker additionally needs the ``protobuf`` package); this one is
    the forward path.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n LONG, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=_RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
