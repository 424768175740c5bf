"""Benchmark decontamination — drop training documents that overlap an
evaluation/benchmark set.

The reference engine has no text operators at all (SURVEY §2.8 is dialect
rendering); this extends the LLM-pipeline surface next to the dedup
family (`operators/dedup.py`): where dedup asks "is this document a copy
of ANOTHER TRAINING document", decontamination asks "does this document
leak a BENCHMARK item" — the standard n-gram-overlap check used before
training-set release.

Scale shape (100 TB corpus, benchmark ≤ a few hundred MB): the benchmark
side collapses to its distinct shingle set and is broadcast, so the
corpus-side pass is a map-side broadcast-hash semi join — no corpus
shuffle — followed by a partially-aggregated count per doc.  The corpus
is read once; cost is independent of how many benchmark files there are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination evidence: (id_col, n_hits) where
    ``n_hits`` counts the DISTINCT ``n``-word shingles the document
    shares with any benchmark document.  Documents with no overlap are
    absent (inner join) — pair with :func:`decontaminate` for filtering.

    Shingling matches the MinHash family (`functions.text.word_shingles`:
    whitespace tokens, space-joined n-grams, short docs yield one
    whole-doc shingle) so one tokenization convention serves dedup and
    decontamination.

    ``broadcast_bench=True`` (default) forces the broadcast fast path —
    no corpus shuffle — and carries a HARD LIMIT: the distinct benchmark
    shingle set must fit in executor and driver memory.  A benchmark of
    B bytes of text explodes to roughly ``n × B`` bytes of shingles, so
    the practical ceiling is benchmarks up to a few hundred MB of text
    on multi-GB executors.  Above that, pass ``broadcast_bench=False``:
    the join degrades to a shuffle hash join (one corpus shuffle on the
    shingle key) instead of OOMing the driver on a forced broadcast.
    """
    d = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(TX.word_shingles(text_col, n))).alias("__sh"),
    )
    b = (
        bench.select(
            F.explode(F.array_distinct(TX.word_shingles(text_col, n))).alias(
                "__sh"
            )
        )
        .distinct()
    )
    return (
        d.join(F.broadcast(b) if broadcast_bench else b, "__sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hits: int = 0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training set with contaminated documents removed: keep documents
    whose shared-shingle count with the benchmark is ≤ ``max_hits``
    (default 0 = any overlap disqualifies).  Anti join against the
    flagged id set — the id set is tiny relative to the corpus, so this
    is again broadcast-shaped at scale.  ``broadcast_bench``: see
    :func:`contamination` (the documented benchmark-size limit).
    """
    flagged = flagged_ids(docs, bench, id_col, text_col, n, max_hits, broadcast_bench)
    return docs.join(F.broadcast(flagged), id_col, "left_anti")


def flagged_ids(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hits: int = 0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The ids :func:`decontaminate` would drop — expose the intermediate
    so callers needing BOTH the clean corpus and a contamination report
    can persist this one small frame and derive each from it with a
    single shingle-join pass (see ``cli.py decontam``)."""
    return (
        contamination(docs, bench, id_col, text_col, n, broadcast_bench)
        .where(F.col("n_hits") > max_hits)
        .select(id_col)
    )
