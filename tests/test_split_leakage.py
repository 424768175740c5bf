"""Cross-split near-duplicate leakage audit (operators/dedup.py)."""

from pyspark.sql import functions as F

from paradump_spark.operators.dedup import (
    split_leakage_pairs,
    split_leakage_report,
)
from paradump_spark.operators.sampling import split


def _corpus_with_leak(spark, sf_dir):
    """Real docs split deterministically, plus one near-copy of a train
    doc planted with a DIFFERENT id (so it lands where its id hashes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = split(docs, "doc_id", {"train": 0.8, "val": 0.2})
    train_doc = parts["train"].first()
    # find an id that hashes into val, clone the train doc's text onto it
    val_ids = [r["doc_id"] for r in parts["val"].limit(5).collect()]
    leak = spark.createDataFrame(
        [(val_ids[0], train_doc["text"] + " tail")], "doc_id long, text string"
    )
    base = docs.where(F.col("doc_id") != val_ids[0]).union(leak)
    lab = base.withColumn(
        "split",
        F.when(F.col("doc_id").isin(val_ids), "val").otherwise(
            F.when(
                F.col("doc_id").isin(
                    [r["doc_id"] for r in parts["val"].collect()]
                ),
                "val",
            ).otherwise("train")
        ),
    )
    return lab, train_doc["doc_id"], val_ids[0]


def test_planted_leak_detected(spark, sf_dir):
    lab, src_id, leak_id = _corpus_with_leak(spark, sf_dir)
    pairs = split_leakage_pairs(
        lab, "doc_id", "text", "split", threshold=0.7
    ).collect()
    found = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in pairs
    }
    assert (min(src_id, leak_id), max(src_id, leak_id)) in found
    for r in pairs:
        assert r["split_a"] != r["split_b"]
        assert r["jaccard"] >= 0.7


def test_audit_equals_independent_cross_split_filter(spark, sf_dir):
    """The audit must be exactly {verified near-dup pairs} ∩ {splits
    differ} — checked against composing the two public primitives by
    hand.  (The synthetic corpus REALLY contains near-duplicates, so a
    hash-random split leaks: the audit finding them is the point.)"""
    from paradump_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from paradump_spark.operators.sampling import split_column

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    lab = docs.withColumn(
        "split", split_column(F.col("doc_id"), {"train": 0.8, "val": 0.2})
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in split_leakage_pairs(lab, "doc_id", "text", "split").collect()
    }
    cands = minhash_lsh_candidates(docs, "doc_id", "text")
    verified = ngram_jaccard_pairs(docs, "doc_id", "text", cands).where(
        F.col("jaccard") >= 0.8
    )
    labels = {
        r["doc_id"]: r["split"] for r in lab.select("doc_id", "split").collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in verified.collect()
        if labels[r["id_a"]] != labels[r["id_b"]]
    }
    assert got == want
    assert got  # the corpus does leak under a hash-random split


def test_report_counts_by_boundary(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight", "train"),
        (2, "the quick brown fox jumps over the lazy dog tonight!", "val"),
        (3, "completely different text about spark shuffles here", "train"),
        (4, "another unrelated document with its own words", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    rep = {
        (r["split_a"], r["split_b"]): r["n_leaking_pairs"]
        for r in split_leakage_report(
            df, "doc_id", "text", "split", threshold=0.6
        ).collect()
    }
    assert rep == {("train", "val"): 1}
