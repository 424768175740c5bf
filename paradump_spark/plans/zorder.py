"""Z-order (Morton-curve) data layout — multi-dimensional clustering for
file skipping.

A single ``ORDER BY a`` layout makes parquet min/max pruning perfect on
``a`` and useless on ``b``.  Interleaving the bits of several normalized
key columns into one Morton code and range-partitioning + sorting by it
gives every participating column locality, so a predicate on ANY of them
prunes most files/row-groups via their min/max stats.  This is the lake
layout companion to the PK-interval chunking in ``plans/split``: chunks
optimize a *known* scan order, Z-order optimizes *unknown* future filters
(the standard technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything is expression-level (shifts/masks in whole-stage codegen); the
only wide operation is the ``repartitionByRange`` any clustered write
needs.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _interleave(norms: list[Column], bits: int) -> Column:
    """Bit-interleave ``len(norms)`` columns already scaled to [0, 2^bits):
    output bit ``i*n + j`` = bit ``i`` of column ``j``.  Pure shift/and/or
    terms — integer-only codegen, no float division in the per-row path."""
    n = len(norms)
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for i in range(bits)
        for j, c in enumerate(norms)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _normalized_cols(
    df: DataFrame, cols: Sequence[str], bits: int
) -> list[Column]:
    """Each column rank-normalized to ``[0, 2^bits)`` by linear min/max
    scaling (one tiny agg job at plan time — the same cost class as
    ``plan_chunks``'s sample)."""

    def as_num(c: str):
        # DATE/TIMESTAMP don't cast to double directly; go through their
        # integer epoch forms first
        dt = df.schema[c].dataType
        if isinstance(dt, T.DateType):
            return F.unix_date(F.col(c)).cast("double")
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # unix_micros wants TIMESTAMP; NTZ→TZ cast is monotonic, which
            # is the only property the curve scaling needs
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        return F.col(c).cast("double")

    stats = df.agg(
        *[F.min(as_num(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(as_num(c)).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    norms = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        scaled = ((as_num(c) - F.lit(mn or 0.0)) / F.lit(span)) * top
        # NULL keys sort first: normalized to 0
        norms.append(F.coalesce(F.round(scaled).cast("long"), F.lit(0)))
    return norms


def zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> Column:
    """Morton code over ``cols`` (numeric or date/timestamp).
    ``bits * len(cols)`` must fit a signed long (≤ 62)."""
    cols = list(cols)
    if bits * len(cols) > 62:
        raise ValueError(f"bits({bits}) * cols({len(cols)}) exceeds a signed long")
    return _interleave(_normalized_cols(df, cols, bits), bits)


def hvalue(df: DataFrame, cols: Sequence[str], bits: int = 16) -> Column:
    """Hilbert-curve index over exactly TWO columns — strictly better
    locality than Morton (every curve step is an adjacent cell, no
    quadrant jumps), the layout used by e.g. Iceberg's Hilbert clustering.

    The classic per-bit rotate/reflect walk (the public-domain xy2d
    algorithm) expressed as one ``aggregate`` fold over the bit indices
    with a (x, y, d) struct accumulator — a single JVM expression, no
    UDF, and no per-bit expression unrolling (which would blow up the
    tree: each level references the previous x/y several times).
    Shift-by-column isn't available as an expression, so ``s = 2^i``
    comes from ``pow`` and bit tests from exact integer division —
    values are < 2^bits ≤ 2^31, well inside double precision.
    """
    cols = list(cols)
    if len(cols) != 2:
        raise ValueError("hvalue is 2-D; use zvalue for other arities")
    if bits * 2 > 62:
        raise ValueError(f"bits({bits}) * 2 exceeds a signed long")
    x0, y0 = _normalized_cols(df, cols, bits)
    zero = F.struct(
        x0.alias("x"), y0.alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc, i):
        s = F.pow(F.lit(2.0), i.cast("double")).cast("long")
        rx = F.pmod(F.floor(acc["x"] / s), F.lit(2)).cast("long")
        ry = F.pmod(F.floor(acc["y"] / s), F.lit(2)).cast("long")
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        fx = F.when(flip, s - 1 - acc["x"]).otherwise(acc["x"])
        fy = F.when(flip, s - 1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, fy).otherwise(fx)  # swap on ry == 0
        ny = F.when(ry == 0, fx).otherwise(fy)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    walk = F.aggregate(
        F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1)), zero, step
    )
    return walk["d"]


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
    curve: str = "morton",
) -> None:
    """Write ``df`` as parquet clustered on the space-filling-curve index
    of ``cols``: range-partitioned into ``num_files`` curve-contiguous
    files, sorted within each so row-group min/max stats stay tight on
    every ``cols`` member.  ``curve='hilbert'`` (2-D only) trades a
    slightly costlier index expression for better locality."""
    if curve == "hilbert":
        z = hvalue(df, cols, bits).alias("__z")
    elif curve == "morton":
        z = zvalue(df, cols, bits).alias("__z")
    else:
        raise ValueError(f"unknown curve {curve!r}; use 'morton' or 'hilbert'")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_overlap_count(
    spark, path: str, col: str, lo, hi
) -> int:
    """Diagnostic: number of distinct parquet files whose rows intersect
    ``col ∈ [lo, hi]`` — the quantity Z-ordering minimizes across ALL
    clustered columns (a linear sort minimizes it for one)."""
    df = spark.read.parquet(path)
    return (
        df.where((F.col(col) >= lo) & (F.col(col) <= hi))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 512,
    sort_col: str | None = None,
    partition_by: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    size-targeted files (optionally re-sorted for min/max locality).

    The small-files problem is the standard decay mode of any
    incrementally-appended lake table (e.g. the signature store's
    per-shard appends, streaming sinks): thousands of tiny files mean
    thousands of tasks and dead parquet metadata overhead.  This is the
    maintenance pass — read, repartition to ceil(bytes/target), rewrite,
    atomic swap.  Returns the new file count.

    Pass ``partition_by`` when compacting a PARTITIONED directory (e.g.
    the band-partitioned signature store) — without it the rewrite would
    silently flatten the layout and lose partition pruning.  In
    partitioned mode the file budget is spread over the partition values
    via a salt (≈ ``ceil(n_files / n_values)`` files per value), and
    ``sort_col`` sorts AFTER the partition keys so the dynamic-partition
    writer's required ordering is already satisfied and the within-file
    order survives.

    Local-FS swap via rename (stale dirs from an interrupted run are
    cleaned on entry, so re-runs succeed); the rename pair itself is not
    atomic — on an object store use a versioned directory + pointer flip
    (or a table format's OPTIMIZE) for crash-safe publication.
    """
    import math
    import os
    import shutil

    from paradump_spark.catalog import _path_size

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    # Crash recovery BEFORE cleanup: a run that died between
    # rename(path, old) and rename(tmp, path) left the ONLY copy of the
    # table in __old — restore it first, or the rmtree below would
    # delete the last surviving data.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)  # stale from an interrupted run
    shutil.rmtree(old, ignore_errors=True)

    df = spark.read.parquet(path)
    total = _path_size(path, suffix=".parquet")
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if partition_by:
        n_values = max(1, df.select(*partition_by).distinct().count())
        per_value = max(1, math.ceil(n_files / n_values))
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(per_value))
        out = df.repartition(
            n_values * per_value, *partition_by, salt
        )
        n_files = n_values * per_value
        sort_keys = [*partition_by, sort_col] if sort_col else list(partition_by)
        out = out.sortWithinPartitions(*sort_keys)
    else:
        out = df.repartition(n_files)
        if sort_col:
            out = out.sortWithinPartitions(sort_col)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    # carry non-parquet sidecars (e.g. the signature store's params file)
    for f in os.listdir(path):
        full = os.path.join(path, f)
        if os.path.isfile(full) and not f.endswith(".parquet") and not f.startswith("_SUCCESS") and not f.endswith(".crc"):
            shutil.copy2(full, os.path.join(tmp, f))
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_files
