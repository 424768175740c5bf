"""Sessionization — gap-based session assignment over an event stream
(beyond-reference; the standard clickstream/training-log primitive).

Batch formulation: per key, order by time; a new session starts when the
gap from the previous event exceeds ``gap``; the session id is the
running count of session starts (one window, two passes over the same
sort — Catalyst reuses the exchange+sort for both).  The streaming
equivalent is ``applyInPandasWithState`` with a session-window timeout
(see streaming.events.running_user_totals for the state pattern) or
Spark's built-in ``session_window`` aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``session_id`` (1-based per key) and ``is_session_start``.

    One shuffle on the key; both windows share the same sort order so the
    physical plan sorts once.  ``order_cols`` breaks timestamp ties
    deterministically (default: the timestamp alone).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_start = F.when(
        prev_ts.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", is_start).withColumn(
        "session_id", F.sum("is_session_start").over(cum)
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup: events, span, start/end timestamps."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_cols)
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
            "span_seconds"
        ),
    )
