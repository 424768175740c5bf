"""Bucketed storage — co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of a repeated big⋈big join is re-shuffling
both sides on every query.  Writing both tables bucketed (and sorted) on
the join key makes the physical layout carry the partitioning: Spark's
bucketed scan exposes the hash-distribution to the planner, and the join
compiles with NO Exchange on either side (and no Sort when ``sort_cols``
match the join key).  This is the lake-table analogue of the reference's
PK-ordered chunk streams.

Use :func:`write_bucketed` once at ingest; every subsequent
:func:`bucketed_join` on the bucket key is exchange-free (verified by a
plan assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) parquet table in the session
    catalog.  ``num_buckets`` should match across tables that join."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner sees
    compatible hash distributions, so neither side shuffles."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
