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


def _tie_keyed(
    df: DataFrame, tie_cols: Sequence[Column | str]
) -> tuple[DataFrame, list[str]]:
    """Materialize the tie expressions as named columns so they can be
    grouped and joined on (a ``.desc()`` sort spec is not a join key)."""
    names = [f"__tk{i}" for i in range(len(tie_cols))]
    for n, c in zip(names, tie_cols):
        df = df.withColumn(n, F.col(c) if isinstance(c, str) else c)
    return df, names


def _rank_groups(
    df: DataFrame,
    order_cols: Sequence[Column],
    tie_cols: Sequence[Column | str],
    num_partitions: int | None,
) -> tuple[DataFrame, list[str], DataFrame, int]:
    """Shared core for rank / dense_rank / tie-aware percent_rank:
    ``(keyed frame, tie-key names, per-tie-group frame with __min_rn,
    total rows)``.

    ``min(row_number)`` over a tie group equals SQL RANK and is
    independent of the (nondeterministic) within-group row order, so
    ``order_cols`` needs NO unique tiebreaker here — the tie groups are
    range-contiguous after ``repartitionByRange`` and the count of
    strictly-earlier rows is exact.
    """
    keyed, names = _tie_keyed(df, tie_cols)
    rn = "__grk_rn"
    ranked, total = _ranked(keyed, order_cols, rn, num_partitions)
    groups = ranked.groupBy(*names).agg(F.min(rn).alias("__min_rn"))
    return ranked.drop(rn), names, groups, total


def _join_back(
    ranked: DataFrame,
    names: list[str],
    groups: DataFrame,
    val: Column,
    out_col: str,
) -> DataFrame:
    """Attach a per-tie-group value to every row — NULL-safe on the tie
    keys (NULL forms its own tie group, as in SQL ordering)."""
    g = groups.select(
        *[F.col(n).alias(f"__g{i}") for i, n in enumerate(names)],
        val.alias(out_col),
    )
    cond = None
    for i, n in enumerate(names):
        c = ranked[n].eqNullSafe(g[f"__g{i}"])
        cond = c if cond is None else (cond & c)
    return ranked.join(g, cond).drop(
        *names, *[f"__g{i}" for i in range(len(names))]
    )


def global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    tie_cols: Sequence[Column | str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``RANK() OVER (ORDER BY ...)`` — ties share the rank, the
    next group skips — without the single-partition window.

    ``order_cols`` is the sort spec (may carry ``.desc()``);
    ``tie_cols`` are the same expressions as PLAIN columns (they define
    the tie groups and the join-back keys).  Plan: distributed
    row_number (`_ranked`) → one groupBy shuffle on the tie keys →
    equi-join of the group rank back onto the rows (broadcast when the
    distinct-key side is small; AQE decides)."""
    ranked, names, groups, _ = _rank_groups(
        df, order_cols, tie_cols, num_partitions
    )
    return _join_back(
        ranked, names, groups, F.col("__min_rn").cast("long"), out_col
    )


def global_dense_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    tie_cols: Sequence[Column | str],
    out_col: str = "dense_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``DENSE_RANK() OVER (ORDER BY ...)`` — consecutive group
    numbers, no gaps.  The distinct tie groups (a far smaller frame) are
    themselves globally row-numbered by their first appearance
    (``min_rn`` is strictly increasing across groups, so this IS the
    dense rank), then joined back."""
    ranked, names, groups, _ = _rank_groups(
        df, order_cols, tie_cols, num_partitions
    )
    dense = global_row_number(
        groups, [F.col("__min_rn").asc()], "__dense", num_partitions
    )
    return _join_back(ranked, names, dense, F.col("__dense"), out_col)


def global_percent_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    out_col: str = "pct_rank",
    num_partitions: int | None = None,
    tie_cols: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Exact ``PERCENT_RANK() OVER (ORDER BY ...)`` without the
    single-partition window: ``(rank − 1) / (total − 1)``.

    PERCENT_RANK uses RANK semantics (ties share a value).  Pass
    ``tie_cols`` (the order expressions as plain columns) to get the
    exact SQL result under duplicate keys; without it, ``order_cols``
    must be a tie-broken total order (the pre-round-6 contract, kept
    for the common unique-key case — one shuffle cheaper)."""
    if tie_cols is not None:
        ranked, names, groups, total = _rank_groups(
            df, order_cols, tie_cols, num_partitions
        )
        denom = max(total - 1, 1)
        return _join_back(
            ranked,
            names,
            groups,
            ((F.col("__min_rn") - 1) / F.lit(denom)).cast("double"),
            out_col,
        )
    rn = "__gpr_rn"
    ranked, total = _ranked(df, order_cols, rn, num_partitions)
    denom = max(total - 1, 1)
    return ranked.withColumn(
        out_col, ((F.col(rn) - 1) / F.lit(denom)).cast("double")
    ).drop(rn)
