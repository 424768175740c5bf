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

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under
#                      PEP 563 (string annotations need module globals)
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


# ---------------------------------------------------------------------------
# Bloom-filter prefilter — the beyond-broadcast scale path
#
# `contamination(broadcast_bench=True)` caps the benchmark at what a
# broadcast exact shingle set can hold (few hundred MB of text); the
# shuffle fallback pays one full corpus shuffle on the shingle key.  A
# Bloom filter removes both limits: at ~10 bits/shingle a 100M-shingle
# benchmark compresses to a 128 MB bit array — broadcastable — and the
# corpus-side membership test is MAP-ONLY (Arrow-batched numpy over the
# broadcast bitmap).  Only the surviving ~FP+true fraction of corpus
# shingles reaches the exact verification join, so the result is EXACT
# (false positives are eliminated by the verify join; false negatives
# are impossible by Bloom construction).

_BLOOM_SLICE_BITS = 1 << 23  # 1 MiB bitmap slices for the distributed build


def _bloom_hashes(sh: F.Column) -> tuple[F.Column, F.Column]:
    """Double-hashing pair (h1, h2|1) from two independent xxhash64
    views of the shingle.  ``|1`` keeps the stride odd, so with a
    power-of-two table every probe index is distinct."""
    return F.xxhash64(sh), F.xxhash64(sh, F.lit(1)).bitwiseOR(F.lit(1))


def _bloom_pos(h1: F.Column, h2odd: F.Column, i: int, n_bits: int) -> F.Column:
    # (h1 + i*h2) mod 2^m.  Mask BEFORE the multiply-add: mod-2^m is a
    # ring homomorphism, so ((h1&mask) + i*(h2&mask)) & mask gives the
    # identical residue while keeping every intermediate < k*2^m — no
    # signed-long overflow under ANSI mode.  The numpy probe computes
    # (a + i*b) & mask in wrapping uint64; same residue class.
    mask = F.lit(n_bits - 1)
    return (
        h1.bitwiseAND(mask) + F.lit(i) * h2odd.bitwiseAND(mask)
    ).bitwiseAND(mask)


#: Floor for the auto-sized bitmap (:func:`auto_bloom_bits`): small
#: benchmark sets keep the historical 4 Mbit table (the bench-comparable
#: configuration), big ones grow with their shingle count.
_BLOOM_AUTO_FLOOR_BITS = 1 << 22


def auto_bloom_bits(
    bench: DataFrame,
    text_col: str = "text",
    n: int = 3,
    floor: int = _BLOOM_AUTO_FLOOR_BITS,
) -> int:
    """Scale-adaptive bitmap size: ~14 bits per distinct benchmark
    shingle (≈0.5% FP at 5 hashes), next power of two, floored at
    ``floor``.  A FIXED n_bits is the classic Bloom scale trap: the
    round-11 sf5 ledger measured the 4 Mbit default saturating against
    a 50×-grown benchmark set — FP rate → 1, so nearly every corpus
    shingle survived the prefilter and the 'pre-filtered' verify join
    degraded to the full join (decontam_bloom sf1→sf5 ratio 6.2, over
    budget).  Sizing is one approx_count_distinct pass over the
    benchmark side (small by contract — it is the side that fits);
    result-invariant by construction: the verify join removes false
    positives whatever the bitmap size."""
    n_sh = (
        bench.select(
            F.explode(
                F.array_distinct(TX.word_shingles(text_col, n))
            ).alias("__sh")
        )
        .agg(F.approx_count_distinct("__sh").alias("n"))
        .collect()[0]["n"]
    )
    target = max(floor, 14 * max(1, int(n_sh)))
    return 1 << (target - 1).bit_length()


def build_bench_bloom(
    bench: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_bits: int | None = 1 << 24,
    n_hashes: int = 5,
):
    """Distributed Bloom build over the benchmark's distinct shingles.

    No driver-side hashing: shingles → k probe positions (JVM
    expressions) → distinct → 1 MiB bitmap slices assembled per-group
    with Arrow-batched numpy → driver ORs ≤ n_bits/2^23 slice rows.
    Returns the packed ``uint8`` bitmap (length ``n_bits/8``).
    """
    import numpy as np
    import pandas as pd

    if n_bits is None:  # scale-adaptive: see auto_bloom_bits
        n_bits = auto_bloom_bits(bench, text_col, n)
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    # no distinct() anywhere in the build: bit-set OR is idempotent, so
    # duplicate shingles/positions cost nothing in the pack stage while
    # a distinct would cost a full extra shuffle each
    sh = bench.select(
        F.explode(
            F.array_distinct(TX.word_shingles(text_col, n))
        ).alias("__sh")
    )
    h1, h2 = _bloom_hashes(F.col("__sh"))
    pos = sh.select(
        F.explode(
            F.array(*[_bloom_pos(h1, h2, i, n_bits) for i in range(n_hashes)])
        ).alias("pos")
    )
    slice_bits = min(_BLOOM_SLICE_BITS, n_bits)
    sliced = pos.withColumn("slice_id", (F.col("pos") / slice_bits).cast("long"))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["slice_id"].iloc[0])
        local = np.zeros(slice_bits // 8, dtype=np.uint8)
        off = pdf["pos"].to_numpy(dtype=np.int64) - sid * slice_bits
        np.bitwise_or.at(local, off >> 3, (1 << (off & 7)).astype(np.uint8))
        return pd.DataFrame({"slice_id": [sid], "bits": [local.tobytes()]})

    rows = (
        sliced.groupBy("slice_id")
        .applyInPandas(_pack, "slice_id long, bits binary")
        .collect()
    )
    bloom = np.zeros(n_bits // 8, dtype=np.uint8)
    for r in rows:
        sid = r["slice_id"]
        bloom[sid * slice_bits // 8 : (sid + 1) * slice_bits // 8] = np.frombuffer(
            r["bits"], dtype=np.uint8
        )
    return bloom


def contamination_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_bits: int | None = 1 << 24,
    n_hashes: int = 5,
    bloom=None,
) -> DataFrame:
    """:func:`contamination` semantics — EXACT same result — via a
    Bloom prefilter: map-only membership test over the broadcast bitmap
    drops the non-overlapping bulk of corpus shingles before the exact
    verification join, so neither a giant broadcast set nor a full
    corpus shuffle is ever needed.

    Sizing: ``n_bits ≈ 10 × distinct benchmark shingles`` gives ~1% FP
    (only cost: FP shingles reach the verify join and are discarded
    there).  ``n_bits=None`` derives that size from the benchmark side
    (:func:`auto_bloom_bits`) — the scale-safe default: a fixed table
    saturates as the benchmark grows and the prefilter silently stops
    filtering (round-11 sf5 ledger).  The bitmap is built distributed (:func:`build_bench_bloom`)
    and broadcast once per job; pass a prebuilt ``bloom`` (the array
    that function returns) to amortize the build across many calls —
    the streaming path scrubs every micro-batch against one bitmap.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if bloom is None:
        if n_bits is None:  # scale-adaptive sizing (see auto_bloom_bits)
            n_bits = auto_bloom_bits(bench, text_col, n)
        bloom = build_bench_bloom(bench, text_col, n, n_bits, n_hashes)
    elif n_bits is None:
        n_bits = len(bloom) * 8  # a prebuilt bitmap carries its own size
    elif len(bloom) * 8 != n_bits:
        raise ValueError(
            f"prebuilt bloom holds {len(bloom) * 8} bits, n_bits={n_bits}"
        )
    spark = docs.sparkSession
    bloom_bc = spark.sparkContext.broadcast(bloom)
    mask = np.uint64(n_bits - 1)

    @pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        arr = bloom_bc.value
        a = h1.to_numpy().astype(np.uint64)
        b = h2.to_numpy().astype(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(n_hashes):
            p = (a + np.uint64(i) * b) & mask
            ok &= (arr[(p >> np.uint64(3)).astype(np.int64)]
                   >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return pd.Series(ok)

    d = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(TX.word_shingles(text_col, n))).alias("__sh"),
    )
    h1, h2 = _bloom_hashes(F.col("__sh"))
    survivors = d.withColumn("__h1", h1).withColumn("__h2", h2).where(
        might_contain(F.col("__h1"), F.col("__h2"))
    )
    b = (
        bench.select(
            F.explode(F.array_distinct(TX.word_shingles(text_col, n))).alias("__sh")
        ).distinct()
    )
    return (
        survivors.join(b, "__sh")  # exact verify: kills Bloom FPs
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
