"""Semi-structured (JSON) column extraction.

Event pipelines carry a free-form JSON properties column; analytics
needs typed fields out of it.  ``from_json`` with an explicit schema
parses once per row inside codegen (JVM Jackson — no Python), yields
NULL on malformed input instead of failing the job, and the projected
struct prunes to only the requested fields.

At 100 TB prefer extracting ONCE into typed columns and persisting
(schema-on-write) over re-parsing per query — ``extract_props`` is both
the per-query escape hatch and the materialization step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_props(
    df: DataFrame,
    props_col: str = "props",
    fields: dict[str, str] | None = None,
    keep_raw: bool = False,
) -> DataFrame:
    """Parse a JSON string column into typed top-level columns.

    ``fields`` maps JSON key → Spark SQL type string (e.g.
    ``{"k": "int"}``).  Malformed JSON or a missing/uncastable key
    yields NULL for that field (PERMISSIVE mode), never an error.
    """
    fields = fields or {"k": "int"}
    schema = ", ".join(f"{k} {t}" for k, t in fields.items())
    parsed = df.withColumn("__p", F.from_json(F.col(props_col), schema))
    out = parsed.select(
        *[c for c in df.columns if keep_raw or c != props_col],
        *[F.col(f"__p.{k}").alias(k) for k in fields],
    )
    return out


def props_field_stats(
    df: DataFrame,
    group_col: str,
    props_col: str = "props",
    field: str = "k",
    field_type: str = "int",
) -> DataFrame:
    """Typed aggregate over one JSON field per group: count / non-null
    count / avg / min / max — the profiling shape for deciding whether a
    props key deserves promotion to a real column."""
    typed = extract_props(df, props_col, {field: field_type})
    c = F.col(field)
    return typed.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c).alias("n_present"),
        F.round(F.avg(c), 6).alias("avg_val"),
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
    )
