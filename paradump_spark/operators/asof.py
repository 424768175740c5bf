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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Output: every left row + the matched right columns (renamed with
    ``suffix`` on collisions), NULL when no right row precedes it.
    The right side must be unique per (key, ts) — pre-dedup it (e.g.
    keep max id per key+ts); multiple right rows at one instant are
    ambiguous under any as-of contract (DuckDB's ASOF JOIN included).
    """
    right_cols = right_cols or [c for c in right.columns if c not in on]
    out_names = [
        c if c not in left.columns else f"{c}{suffix}" for c in right_cols
    ]

    payload = F.struct(*[F.col(c) for c in right_cols])
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
    # right rows (probe=0) sort before a probe at the same ts -> inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    probes = u.withColumn("__carried", carried).where(F.col("__probe") == 1)
    return probes.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.col("__carried").getField(rc).alias(oc)
            for rc, oc in zip(right_cols, out_names)
        ],
    )
