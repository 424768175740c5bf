"""Deterministic shard export (sinks/shards.py)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from paradump_spark.sinks.shards import (
    shard_id,
    shard_plan,
    verify_shards,
    write_shards,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_assignment_deterministic_and_partition_invariant(spark, docs):
    a = docs.select("doc_id", shard_id(F.col("doc_id"), 8).alias("s")).collect()
    b = (
        docs.repartition(13)
        .select("doc_id", shard_id(F.col("doc_id"), 8).alias("s"))
        .collect()
    )
    assert {r["doc_id"]: r["s"] for r in a} == {r["doc_id"]: r["s"] for r in b}
    assert all(0 <= r["s"] < 8 for r in a)


def test_plan_covers_corpus(docs):
    plan = shard_plan(docs, "doc_id", 8, size_col="n_chars").collect()
    assert sum(r["n_rows"] for r in plan) == docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["n_bytes"] for r in plan) == total_chars


def test_write_one_file_per_shard_and_verify(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest_path = write_shards(
        docs, out, "doc_id", 4, sort_col="doc_id", fmt="parquet"
    )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    assert manifest["n_shards"] == 4
    # one data file per shard directory
    for s in manifest["shards"]:
        files = glob.glob(os.path.join(out, f"shard={s}", "*.parquet"))
        assert len(files) == 1, (s, files)
    # round-trip faithful
    assert all(verify_shards(spark, out).values())
    # content identical to source (modulo the added shard column)
    back = spark.read.parquet(out).drop("shard")
    assert back.count() == docs.count()
    assert (
        back.join(docs, "doc_id", "inner").count() == docs.count()
    )


def test_verify_detects_tamper(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, "doc_id", 4)
    # drop one shard's file entirely
    victim = glob.glob(os.path.join(out, "shard=1", "*.parquet"))[0]
    os.remove(victim)
    res = verify_shards(spark, out)
    assert res["1"] is False
    assert res["0"] is True


def test_membership_stable_under_corpus_growth(spark, docs):
    """Adding documents must not move any existing doc's shard."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_assign = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", shard_id(F.col("doc_id"), 8).alias("s")
        ).collect()
    }
    half_assign = {
        r["doc_id"]: r["s"]
        for r in half.select(
            "doc_id", shard_id(F.col("doc_id"), 8).alias("s")
        ).collect()
    }
    for k, v in half_assign.items():
        assert full_assign[k] == v


def test_jsonl_shards_round_trip(spark, docs, tmp_path):
    out = str(tmp_path / "jshards")
    write_shards(docs.select("doc_id", "lang"), out, "doc_id", 3, fmt="jsonl")
    back = spark.read.json(os.path.join(out, "shard=*"))
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "lang"}
    with pytest.raises(ValueError):
        verify_shards(spark, out)


def test_bad_format_rejected(docs, tmp_path):
    with pytest.raises(ValueError):
        write_shards(docs, str(tmp_path / "x"), "doc_id", 2, fmt="orc")


def test_append_preserves_membership_and_checksums(spark, docs, tmp_path):
    from paradump_spark.sinks.shards import append_to_shards

    out = str(tmp_path / "grow")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    write_shards(old, out, "doc_id", 4)
    append_to_shards(new, out)
    # merged set verifies against the additively-updated manifest
    assert all(verify_shards(spark, out).values())
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # every row is in the shard its id hashes to (old AND appended)
    mismatched = back.withColumn(
        "want", shard_id(F.col("doc_id"), 4)
    ).where(F.col("shard") != F.col("want"))
    assert mismatched.count() == 0


def test_append_then_tamper_detected(spark, docs, tmp_path):
    from paradump_spark.sinks.shards import append_to_shards

    out = str(tmp_path / "grow2")
    write_shards(docs.limit(60), out, "doc_id", 3)
    append_to_shards(docs.filter(F.col("doc_id") >= 90).limit(30), out)
    victim = glob.glob(os.path.join(out, "shard=0", "*.parquet"))[0]
    os.remove(victim)
    assert verify_shards(spark, out)["0"] is False


def test_verify_flags_planted_shard(spark, docs, tmp_path):
    """A shard directory whose id is absent from the manifest must show
    up as a False entry, not be silently skipped (ADVICE r04)."""
    out = str(tmp_path / "planted")
    write_shards(docs.limit(40), out, "doc_id", 3)
    planted = docs.limit(5).withColumn("shard", F.lit(99))
    planted.repartition(1).write.mode("append").partitionBy("shard").parquet(out)
    res = verify_shards(spark, out)
    assert res["99"] is False
    assert res["0"] is True and res["1"] is True and res["2"] is True


def test_append_reapplies_sort_col(spark, docs, tmp_path):
    """write_shards' sort_col is persisted in the manifest and re-applied
    on append, so every part file stays internally ordered."""
    from paradump_spark.sinks.shards import append_to_shards

    out = str(tmp_path / "sorted_grow")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    write_shards(old, out, "doc_id", 3, sort_col="doc_id")
    with open(os.path.join(out, "_shards.json")) as fh:
        assert json.load(fh)["sort_col"] == "doc_id"
    append_to_shards(new, out)
    for f in glob.glob(os.path.join(out, "shard=*", "*.parquet")):
        ids = [r["doc_id"] for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids), f
