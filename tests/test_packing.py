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


# ---------------------------------------------------------------------------
# chunk_documents (round 5)


def test_chunk_documents_windows_and_tail(spark):
    from paradump_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", window=4, stride=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 0,3,6,9 → 4 chunks, last is the 1-token tail
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 1]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"  # overlap of 1
    assert rows[3]["chunk_text"] == "t9"


def test_chunk_documents_every_token_covered(spark):
    """With stride == window (no overlap) the chunks partition the
    token stream exactly."""
    from paradump_spark.operators.packing import chunk_documents

    texts = [(i, " ".join(f"w{i}_{j}" for j in range(n)))
             for i, n in [(1, 1), (2, 7), (3, 8), (4, 9), (5, 25)]]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", window=8)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for i, text in texts:
        rebuilt = " ".join(t for _, t in sorted(got[i]))
        assert rebuilt == text, i
    assert [len(got[i]) for i in (1, 2, 3, 4, 5)] == [1, 1, 1, 2, 4]


def test_chunk_documents_drops_empty_and_null(spark):
    from paradump_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "one two"), (2, "   "), (3, None)], "doc_id long, text string"
    )
    rows = chunk_documents(df, "doc_id", "text", window=4).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from paradump_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", window=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", window=4, stride=5)


def test_chunk_documents_map_only_plan(spark, sf_dir):
    """The 1→N fan-out must stay inside the scan stage: no Exchange, no
    Python eval."""
    from paradump_spark.operators.packing import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        chunk_documents(docs, "doc_id", "text", window=64, stride=48)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
