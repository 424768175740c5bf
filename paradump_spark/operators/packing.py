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
        parts = list(batches)  # NB: a generator is truthy even when empty
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf) == 0:
            return
        # nullable longs arrive as float64 + NaN; a missing count packs as 0
        # (the doc still gets a bin) rather than killing a 100-TB stage
        pdf[tokens_col] = pdf[tokens_col].fillna(0)
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], ignore_index=True
        )
        n = len(pdf)
        # First-fit via a max segment tree over bin capacities: leaf i =
        # remaining capacity of bin i, unopened bins start at max_tokens,
        # so "leftmost leaf with cap >= need" both finds the first open
        # bin that fits AND falls through to the next fresh bin —
        # O(log n) per doc instead of a linear scan over open bins.
        tsize = 1
        while tsize < n:
            tsize *= 2
        tree = [max_tokens] * (2 * tsize)

        def tree_set(pos: int, val: int) -> None:
            i = tsize + pos
            tree[i] = val
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2

        def tree_first_fit(need: int) -> int:
            if tree[1] < need:
                return -1
            i = 1
            while i < tsize:
                i = 2 * i if tree[2 * i] >= need else 2 * i + 1
            return i - tsize

        opened = 0
        assigned: list[int] = []
        base = pid * _PART_STRIDE
        for tok in pdf[tokens_col]:
            need = int(tok)
            placed = tree_first_fit(need)
            if placed < 0:  # oversize doc: singleton bin, capacity spent
                placed = opened
                tree_set(placed, 0)
            else:
                tree_set(placed, tree[tsize + placed] - need)
            opened = max(opened, placed + 1)
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


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    stride: int | None = None,
) -> DataFrame:
    """Split each document's whitespace-token stream into fixed-size
    training chunks: chunk ``i`` covers tokens ``[i·stride, i·stride +
    window)``; ``stride < window`` gives overlapping context windows
    (the standard long-document prep BEFORE `pack_documents` bins the
    chunks).  The final chunk keeps the tail even when shorter than
    ``window``; zero-token documents yield no chunks (empty docs are
    upstream-filter material, not training data).

    Output: (id, chunk_idx, n_chunk_tokens, chunk_text).

    Pure JVM — tokenize once, ``sequence`` the start offsets,
    ``posexplode`` + ``slice``; map-only (the 1→N fan-out happens
    inside the scan stage, no shuffle), so chunking a 100 TB corpus is
    embarrassingly parallel and the output streams straight into the
    packer's partition-local bins.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    stride = window if stride is None else stride
    if not 1 <= stride <= window:
        raise ValueError(f"stride must be in [1, window], got {stride}")
    from paradump_spark.functions import text as TX

    toks = df.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # number of chunks: 1 + floor((n - 1) / stride) when every start
    # must begin before the stream ends (starts at 0, stride, 2·stride …
    # < n); the last may be a short tail
    n_chunks = F.when(
        F.col("__n") > 0,
        (F.lit(1) + F.floor((F.col("__n") - 1) / F.lit(stride))).cast("int"),
    ).otherwise(F.lit(0))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — zero-token
    # docs must be dropped before the explode, not fed to sequence()
    exploded = toks.withColumn("__nc", n_chunks).where(F.col("__nc") > 0).select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(F.sequence(F.lit(1), F.col("__nc"))).alias(
            "chunk_idx", "__one"
        ),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, window
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
