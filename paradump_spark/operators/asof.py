"""As-of (point-in-time) join — a custom operator Spark's built-ins don't
ship (beyond-reference; the classic time-series primitive).

For each left row, attach the latest right row whose timestamp is ≤ the
left timestamp, per key ("backward" as-of, inclusive — the same contract
as DuckDB's ``ASOF JOIN`` and pandas ``merge_asof``).

Spark-first formulation — NO range join, NO per-key loop:

1. union left probes and right events into one stream tagged by side,
2. one window per key ordered by (ts, side) carrying the last non-null
   right payload forward (``last(…, ignorenulls=True)`` over rows
   UNBOUNDED PRECEDING..CURRENT),
3. keep the probe rows, unpack the carried payload.

Cost: ONE shuffle on the key (the union sorts inside the window), which
is the lower bound for co-locating both sides.  Skewed keys are genuine
hot entities; AQE splits them.  This beats the naive
``left.join(right, ts_range)`` + groupBy-max formulation, which shuffles
twice and explodes on wide time ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join, backward (default) or forward, optionally bounded.

    ``direction="backward"``: latest right row with ts ≤ left ts (the
    DuckDB ``ASOF JOIN`` contract); ``"forward"``: earliest right row with
    ts ≥ left ts.  ``tolerance_seconds`` nulls out matches farther than
    the bound from the probe (pandas ``merge_asof(tolerance=…)``) — same
    single-shuffle plan, the bound is applied after the carry.

    Output: every left row + the matched right columns (renamed with
    ``suffix`` on collisions), NULL when no right row qualifies.
    The right side must be unique per (key, ts) — pre-dedup it (e.g.
    keep max id per key+ts); multiple right rows at one instant are
    ambiguous under any as-of contract (DuckDB's ASOF JOIN included).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in on]
    out_names = [
        c if c not in left.columns else f"{c}{suffix}" for c in right_cols
    ]

    # carry the right timestamp alongside the payload so a tolerance
    # bound can be applied after the window carry
    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    l_tag = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__probe"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__probe"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("p")
            ).schema["p"].dataType
        ).alias("__l"),
        payload.alias("__r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows (probe=0) sort before a probe at the same ts -> inclusive;
    # forward direction flips the ts ordering so "last preceding" becomes
    # "nearest following"
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    probes = u.withColumn("__carried", carried).where(F.col("__probe") == 1)
    if tolerance_seconds is not None:
        # DATE doesn't cast to double; route temporals through epoch forms
        lts_type = left.schema[left_ts].dataType

        def _secs(c: Column) -> Column:
            import pyspark.sql.types as T

            if isinstance(lts_type, T.DateType):
                return (F.unix_date(c) * 86400).cast("double")
            if isinstance(lts_type, (T.TimestampType, T.TimestampNTZType)):
                return F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
            return c.cast("double")

        gap = F.abs(
            _secs(F.col("__ts")) - _secs(F.col("__carried").getField("__rts"))
        )
        probes = probes.withColumn(
            "__carried",
            F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__carried")),
        )
    return probes.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.col("__carried").getField(rc).alias(oc)
            for rc, oc in zip(right_cols, out_names)
        ],
    )
