"""Range (interval) join — the second custom operator the brief names
alongside as-of join: pair left rows with right rows whose timestamp
falls in ``[left_ts - before, left_ts + after]`` (inclusive), optionally
per key.

Spark-first formulation — bucketized candidate generation, NOT a naive
theta-join:

1. pick bucket width w = before + after (the interval span),
2. each left row explodes into the (≤3) buckets its interval overlaps,
3. equi-join on (keys…, bucket) — a plain shuffle/broadcast hash join —
4. exact interval filter on the survivors.

Cost: candidates are bounded by rows sharing a bucket, not |L|×|R|; the
join is an equi-join Catalyst can hash/broadcast/AQE-skew-split.  A raw
``l.join(r, l.ts between …)`` without equi keys degenerates to a
broadcast-nested-loop/cartesian — the classic scale killer this operator
exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    after_seconds: int,
    before_seconds: int = 0,
    on: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner interval join: every (left, right) pair with
    ``left_ts - before ≤ right_ts ≤ left_ts + after`` (second
    granularity), matching on ``on`` keys when given.

    Output: all left columns + right columns (suffixed on collision).
    """
    span = before_seconds + after_seconds
    if span <= 0:
        raise ValueError("before_seconds + after_seconds must be positive")
    on = on or []

    lsec = F.col(left_ts).cast("long")
    rsec = F.col(right_ts).cast("long")

    lo_bucket = F.floor((lsec - before_seconds) / span)
    hi_bucket = F.floor((lsec + after_seconds) / span)
    l_exp = left.withColumn(
        "__bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    r_tag = right.select(
        *[F.col(c) for c in right.columns],
        F.floor(rsec / span).alias("__bucket"),
    )
    rename = {
        c: (f"{c}{suffix}" if c in left.columns else c)
        for c in right.columns
        if c not in on
    }
    r_tag = r_tag.select(
        *[F.col(c) for c in on],
        *[F.col(c).alias(n) for c, n in rename.items()],
        "__bucket",
    )
    joined = l_exp.join(r_tag, on=on + ["__bucket"])
    rts_out = rename.get(right_ts, right_ts)
    cond = (
        (F.col(rts_out).cast("long") >= lsec - before_seconds)
        & (F.col(rts_out).cast("long") <= lsec + after_seconds)
    )
    return joined.where(cond).drop("__bucket")
