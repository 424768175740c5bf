from paradump_spark.plans.split import (
    Chunk,
    chunk_predicates_sql,
    composite_range_sql,
    equality_sql,
    plan_chunks,
    range_filter,
)

__all__ = [
    "Chunk",
    "chunk_predicates_sql",
    "composite_range_sql",
    "equality_sql",
    "plan_chunks",
    "range_filter",
]
