"""Table profiling — one-pass per-column statistics in long format.

The reference's metadata aggregates (A3: size/rows from information_schema,
src/paradump/paradump.go:773) stop at table granularity; real pipelines
profile columns before choosing split keys, dedup keys, or quality gates.
This computes every column's null count, exact distinct count, and
min/max (rendered to text) in ONE wide aggregation — a single scan and a
single reduce regardless of column count — then unpivots to
``(column, n_nulls, n_distinct, min_text, max_text)`` rows.

``count(DISTINCT x)`` per column would shuffle once per column; here each
distinct is an exact HLL-free two-level aggregate only when asked
(``exact_distinct=False`` switches to ``approx_count_distinct``, the
100 TB default — one pass, mergeable sketches, ~2% error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile of ``columns`` (default: all).

    ``exact_distinct=True`` uses ``count_distinct`` (exact, needed for
    oracle parity and small data); ``False`` uses
    ``approx_count_distinct`` — the scale choice, since exact distinct on
    every column of a wide 100 TB table is one full shuffle per column.
    """
    cols = columns or df.columns
    distinct_of = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            distinct_of(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)

    # unpivot via stack: 5 expressions per column, all plan-time constants.
    # Escape quotes/backticks — column names are data here, and the CLI
    # profiles arbitrary tables
    def lit_str(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def ident(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    stack_args = ", ".join(
        f"{lit_str(c)}, {ident(f'__nn_{c}')}, {ident(f'__nd_{c}')}, "
        f"{ident(f'__mn_{c}')}, {ident(f'__mx_{c}')}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct, min_text, max_text)"
        )
    )


def sketch_profile(
    df: DataFrame, columns: list[str] | None = None, lgk: int = 12
) -> DataFrame:
    """Mergeable per-column profile: ``(column_name, n_rows, n_nulls,
    dist_sketch)`` where ``dist_sketch`` is a DataSketches HLL binary.

    The point is incrementality at 100 TB: profile each ingest batch ONCE
    when it lands, store these rows next to the data (like the dedup
    signature store), and answer "distincts across all of history" by
    :func:`merge_sketch_profiles` over the stored sketches — no rescan.
    Sketches are ~``2^lgk`` bytes per column regardless of data size and
    union without error accumulation (HLL union is lossless over the
    same lgConfigK).

    Values are sketched as strings so every column type hashes one way
    across batches (DataSketches HLL accepts int/long/string/binary, not
    temporal/double natively).
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__nr_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.hll_sketch_agg(col.cast("string"), F.lit(lgk)).alias(f"__sk_{c}"),
        ]
    wide = df.agg(*aggs)

    def lit_str(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def ident(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    stack_args = ", ".join(
        f"{lit_str(c)}, {ident(f'__nr_{c}')}, {ident(f'__nn_{c}')}, "
        f"{ident(f'__sk_{c}')}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column_name, n_rows, n_nulls, dist_sketch)"
        )
    )


def merge_sketch_profiles(profiles: DataFrame) -> DataFrame:
    """Fold any union of :func:`sketch_profile` outputs into one profile:
    ``(column_name, n_rows, n_nulls, n_distinct_est)``.

    Counts add; sketches union.  Input is typically a read of the stored
    per-batch profile rows — cells × batches rows of ~KB each, so this
    runs in one tiny shuffle however large the profiled data was.
    """
    return (
        profiles.groupBy("column_name")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nulls").alias("n_nulls"),
            F.hll_union_agg("dist_sketch").alias("__u"),
        )
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            F.hll_sketch_estimate("__u").alias("n_distinct_est"),
        )
    )
