"""Document packing — grouping variable-length documents into fixed
token-budget bins (training-sequence construction for LLM pipelines).

Packing is the canonical "Spark can't say this in SQL" operator: bin
assignment depends on running state over an ordered stream.  The scale
answer is partition-local packing: each task packs ITS documents with
first-fit-decreasing (≥ (1 - 1/9)·OPT fill guarantee from classic bin
packing theory), and bin ids are made globally unique by namespacing with
the partition id.  No shuffle, no driver state, no cross-partition
coordination — at 100 TB every task packs its own ~128 MB slice, and the
only waste vs a (non-parallelizable) global pack is at most one
partially-filled tail bin per partition.

Implemented with ``mapInPandas`` (Arrow batches, no per-row Python); the
per-partition sort is in pandas over one task's rows, the same memory
class as any shuffle partition.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bin ids are ``partition_id * _PART_STRIDE + local_bin`` — collision-free
#: as long as one partition packs fewer than a trillion bins.
_PART_STRIDE = 1 << 40


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    partitions: int | None = None,
) -> DataFrame:
    """Assign every document a ``bin_id`` such that each bin's token total
    is ≤ ``max_tokens`` (oversize documents get a singleton bin).

    Output: ``(id_col, tokens_col, bin_id)``.  Deterministic for a fixed
    partitioning: rows are packed first-fit in (tokens desc, id asc)
    order inside each partition.  Pass ``partitions`` to repartition by
    ``id_col`` first — deterministic row→partition mapping via hash, so
    repeated runs produce identical bins.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    src = df.select(id_col, tokens_col)
    if partitions:
        src = src.repartition(partitions, id_col)

    id_field = src.schema[id_col]
    tok_field = src.schema[tokens_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField(tokens_col, tok_field.dataType),
            T.StructField("bin_id", T.LongType()),
        ]
    )

    def pack(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdf = pd.concat(list(batches), ignore_index=True) if batches else None
        if pdf is None or len(pdf) == 0:
            return
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], ignore_index=True
        )
        bins_remaining: list[int] = []  # remaining capacity per local bin
        assigned: list[int] = []
        base = pid * _PART_STRIDE
        for tok in pdf[tokens_col]:
            need = int(tok)
            placed = None
            # first-fit over open bins; oversize docs get a fresh bin
            for i, rem in enumerate(bins_remaining):
                if rem >= need:
                    placed = i
                    break
            if placed is None:
                bins_remaining.append(max(max_tokens - need, 0))
                placed = len(bins_remaining) - 1
            else:
                bins_remaining[placed] -= need
            assigned.append(base + placed)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        yield pdf

    return src.mapInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, tokens_col: str, max_tokens: int) -> DataFrame:
    """One row of fill diagnostics: bins, docs, mean fill ratio, overflow
    bins (singleton oversize documents)."""
    per_bin = packed.groupBy("bin_id").agg(
        F.sum(tokens_col).alias("bin_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.round(
            F.avg(
                F.least(F.col("bin_tokens"), F.lit(max_tokens)).cast("double")
                / max_tokens
            ),
            6,
        ).alias("mean_fill"),
        F.sum(
            F.when(F.col("bin_tokens") > max_tokens, 1).otherwise(0)
        ).alias("oversize_bins"),
    )
