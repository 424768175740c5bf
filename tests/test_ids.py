"""Stable content-hash IDs + collision audit (operators/ids.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.ids import (
    assign_stable_ids,
    collision_report,
    stable_id,
)


def test_matches_python_md5(spark):
    df = spark.createDataFrame(
        [("alpha",), ("beta",), (None,)], "k string"
    )
    got = {
        r["k"]: r["stable_id"]
        for r in assign_stable_ids(df, ["k"]).collect()
    }
    for k in ["alpha", "beta"]:
        want = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        assert got[k] == want
    assert got[None] == int(hashlib.md5(b"\x00").hexdigest()[:15], 16)


def test_multi_column_separator_prevents_aliasing(spark):
    df = spark.createDataFrame(
        [("a", "bc"), ("ab", "c")], "x string, y string"
    )
    ids = [r["stable_id"] for r in assign_stable_ids(df, ["x", "y"]).collect()]
    assert ids[0] != ids[1]


def test_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        r["doc_id"]: r["stable_id"]
        for r in assign_stable_ids(docs, ["doc_id"]).collect()
    }
    b = {
        r["doc_id"]: r["stable_id"]
        for r in assign_stable_ids(docs.repartition(17), ["doc_id"]).collect()
    }
    assert a == b


def test_collision_report_clean_and_forced(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = collision_report(docs, ["doc_id"]).collect()[0]
    assert row["n_collisions"] == 0
    assert row["n_keys"] == row["n_ids"] == docs.count()
    # tiny id space forces collisions deterministically
    forced = collision_report(docs, ["doc_id"], bits=4).collect()[0]
    assert forced["n_ids"] <= 16
    assert forced["n_collisions"] == forced["n_keys"] - forced["n_ids"] > 0


def test_bits_validation(spark):
    with pytest.raises(ValueError):
        stable_id(F.col("x"), bits=61)
