"""Document packing: capacity invariant, coverage, determinism, fill."""

from pyspark.sql import functions as F

from paradump_spark.functions.text import token_count
from paradump_spark.operators.packing import pack_documents, packing_stats

MAX_TOK = 256


def _docs_with_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )


def test_pack_capacity_and_coverage(spark, sf_dir):
    d = _docs_with_counts(spark, sf_dir)
    packed = pack_documents(d, "doc_id", "n_tokens", MAX_TOK, partitions=4)
    rows = packed.collect()
    assert len(rows) == d.count()  # every doc assigned exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)

    per_bin: dict[int, list[int]] = {}
    for r in rows:
        per_bin.setdefault(r["bin_id"], []).append(r["n_tokens"])
    for toks in per_bin.values():
        # bins fit the budget unless they hold a single oversize doc
        assert sum(toks) <= MAX_TOK or (len(toks) == 1 and toks[0] > MAX_TOK)


def test_pack_deterministic(spark, sf_dir):
    d = _docs_with_counts(spark, sf_dir)
    a = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(d, "doc_id", "n_tokens", MAX_TOK, partitions=4).collect()
    )
    b = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(d, "doc_id", "n_tokens", MAX_TOK, partitions=4).collect()
    )
    assert a == b


def test_pack_fill_beats_naive(spark, sf_dir):
    """FFD should land well above the 50% fill a one-doc-per-bin split has."""
    d = _docs_with_counts(spark, sf_dir).where(F.col("n_tokens") <= MAX_TOK)
    packed = pack_documents(d, "doc_id", "n_tokens", MAX_TOK, partitions=4)
    stats = packing_stats(packed, "n_tokens", MAX_TOK).collect()[0]
    assert stats["oversize_bins"] == 0
    assert stats["n_docs"] == d.count()
    assert stats["mean_fill"] > 0.5, stats


def test_pack_rejects_bad_budget(spark, sf_dir):
    import pytest

    d = _docs_with_counts(spark, sf_dir)
    with pytest.raises(ValueError):
        pack_documents(d, "doc_id", "n_tokens", 0)


def test_pack_handles_empty_partitions_and_null_counts(spark):
    """Regression: 1 row over 8 partitions (7 empty) must not crash, and a
    NULL token count packs as 0 instead of killing the task."""
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "doc_id long, n_tokens long"
    )
    out = pack_documents(df, "doc_id", "n_tokens", 64, partitions=8).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
