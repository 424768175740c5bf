"""Distributed EXACT global ranking: row_number / ntile without the
single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves every
row through one task (`WindowExec: No Partition Defined`) — the classic
scale cliff for "rank the whole corpus" steps (CCNet perplexity
buckets, spend quartiles).  The exact distributed alternative is the
two-pass offset plan every MPP engine uses:

1. ``repartitionByRange`` on the order columns — partitions are
   range-disjoint and partition index order IS sort order;
2. one tiny aggregate counts rows per partition; the driver turns the
   (≤ num_partitions) counts into cumulative offsets;
3. ``row_number`` windowed WITHIN each partition (distributed) plus the
   broadcast offset reproduces the global row number exactly.

``global_ntile`` then derives the bucket from (rn, total) with SQL
NTILE's exact fill rule — the first ``total mod n`` buckets take one
extra row — so the result is bit-identical to the naive global-window
plan whenever ``order_cols`` is a total order (include a unique
tiebreaker).

The ranged frame is consumed twice (counts + final output), so it is
``localCheckpoint``'d: one materialization of the input, never a
re-execution of the upstream plan.  At 100 TB, project down to
(order cols + key) before ranking and join the payload back.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranked(
    df: DataFrame,
    order_cols: Sequence[Column],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """(frame with exact global row numbers in ``out_col``, total rows).

    The total is a free by-product of the offset pass — callers that
    need it (ntile) must not pay a second count job.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = df.repartitionByRange(num_partitions, *order_cols).localCheckpoint(
        eager=True
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    counts = sorted(
        (r["__pid"], r["n"])
        for r in with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((int(pid), acc))
        acc += int(n)
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        with_pid.join(offset_df, "__pid")
        .withColumn(out_col, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )
    return out, acc


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over ``order_cols`` with no
    single-partition window (see module docstring).  ``order_cols``
    must be a total order (include a unique tiebreaker) for the result
    to be deterministic.
    """
    out, _ = _ranked(df, order_cols, out_col, num_partitions)
    return out


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: Sequence[Column],
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY ...)`` without a global window.

    SQL NTILE fill rule: with ``total = q*n + r``, the first ``r``
    buckets hold ``q+1`` rows, the rest ``q`` — reproduced here from
    the distributed global row number, so the output matches the naive
    window plan (and any ANSI engine) bit-for-bit.
    """
    rn = "__gnt_rn"
    ranked, total = _ranked(df, order_cols, rn, num_partitions)
    q, r = divmod(total, n_buckets)
    head = r * (q + 1)  # rows living in the q+1-sized buckets
    if q == 0:
        bucket = F.col(rn)  # total < n_buckets: bucket i = row i
    else:
        # ceil(a/b) as exact integer math — `(a-1) div b + 1` — so a
        # boundary row can never land in the wrong bucket to floating
        # rounding at billion-row rn.
        bucket = F.when(
            F.col(rn) <= head,
            F.expr(f"({rn} - 1) div {q + 1} + 1"),
        ).otherwise(F.expr(f"{r} + ({rn} - {head} - 1) div {q} + 1"))
    return ranked.withColumn(out_col, bucket.cast("long")).drop(rn)


def global_percent_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    out_col: str = "pct_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``PERCENT_RANK() OVER (ORDER BY ...)`` without the
    single-partition window: ``(rank − 1) / (total − 1)`` from the
    distributed row number.  NOTE the SQL subtlety — PERCENT_RANK uses
    RANK (ties share a value), so the caller's ``order_cols`` here are
    the TIE-BROKEN total order and this function reproduces the window
    result exactly only when the ordering has no duplicates (give it a
    unique tiebreak; with ties, SQL's rank semantics need the tie-free
    prefix of ``order_cols`` — use `global_row_number` + a self-join on
    the tie columns for that case)."""
    rn = "__gpr_rn"
    ranked, total = _ranked(df, order_cols, rn, num_partitions)
    denom = max(total - 1, 1)
    return ranked.withColumn(
        out_col, ((F.col(rn) - 1) / F.lit(denom)).cast("double")
    ).drop(rn)
