"""Bloom-prefiltered decontamination: exact result, map-side prefilter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.decontam import (
    build_bench_bloom,
    contamination,
    contamination_bloom,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark partitions"),
            (3, "quick brown fox jumps again and again today"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps high"), (101, "short doc")],
        "doc_id long, text string",
    )


def test_bloom_equals_exact_tiny(spark):
    exact = {
        (r["doc_id"], r["n_hits"])
        for r in contamination(_docs(spark), _bench(spark)).collect()
    }
    bloom = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_bloom(
            _docs(spark), _bench(spark), n_bits=1 << 16
        ).collect()
    }
    assert bloom == exact


def test_bloom_equals_exact_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select(
        "doc_id", F.substring("text", 1, 80).alias("text")
    )
    exact = {
        (r["doc_id"], r["n_hits"])
        for r in contamination(docs, bench).collect()
    }
    bloom = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_bloom(docs, bench, n_bits=1 << 20).collect()
    }
    assert bloom == exact
    assert len(exact) > 0


def test_no_false_negatives_even_when_saturated(spark, sf_dir):
    """An undersized bitmap only raises the FP rate (more verify work) —
    the verify join keeps the RESULT exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.limit(30).select("doc_id", "text")
    exact = {
        (r["doc_id"], r["n_hits"])
        for r in contamination(docs, bench).collect()
    }
    tiny_bloom = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_bloom(docs, bench, n_bits=1 << 10).collect()
    }
    assert tiny_bloom == exact


def test_bitmap_build_sets_every_bench_shingle(spark):
    """Bloom guarantee: membership test is True for every inserted key."""
    bench = _bench(spark)
    n_bits, k = 1 << 16, 5
    bloom = build_bench_bloom(bench, n_bits=n_bits, n_hashes=k)
    from paradump_spark.functions import text as TX
    from paradump_spark.operators.decontam import _bloom_hashes

    h1c, h2c = _bloom_hashes(F.col("__sh"))
    rows = (
        bench.select(
            F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("__sh")
        )
        .select(h1c.alias("h1"), h2c.alias("h2"))
        .collect()
    )
    mask = np.uint64(n_bits - 1)
    with np.errstate(over="ignore"):  # wraparound is the point
        for r in rows:
            a = np.int64(r["h1"]).astype(np.uint64)
            b = np.int64(r["h2"]).astype(np.uint64)
            for i in range(k):
                p = (a + np.uint64(i) * b) & mask
                assert (bloom[int(p) >> 3] >> (int(p) & 7)) & 1 == 1


def test_rejects_non_power_of_two(spark):
    with pytest.raises(ValueError):
        build_bench_bloom(_bench(spark), n_bits=1000)


def test_cli_bloom_flag(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    out = str(tmp_path / "clean")
    rc = main(
        [
            "decontam",
            "--directory", sf_dir,
            "--bench-directory", sf_dir,
            "--output", out,
            "--bloom-bits", str(1 << 20),
        ]
    )
    assert rc == 0
    # corpus decontaminated against itself: every doc overlaps itself
    assert spark.read.parquet(out).count() == 0


def test_cli_validates_bloom_bits_early(tmp_path):
    """Bad --bloom-bits must die in validate() with a message, not as a
    mid-job ValueError; --no-broadcast-bench + --bloom-bits conflict
    (ADVICE r04)."""
    from paradump_spark.cli import main

    base = [
        "decontam",
        "--directory", "/nonexistent",
        "--bench-directory", "/nonexistent",
        "--output", str(tmp_path / "x"),
    ]
    with pytest.raises(SystemExit):
        main(base + ["--bloom-bits", "1000"])
    with pytest.raises(SystemExit):
        main(base + ["--bloom-bits", "-8"])
    with pytest.raises(SystemExit):
        main(base + ["--bloom-bits", str(1 << 20), "--no-broadcast-bench"])


def test_auto_bloom_bits_floor_and_growth(spark, sf_dir):
    """Round-11 scale-adaptive sizing: small benchmark sets keep the
    historical 4 Mbit floor (bench-comparable), the size grows with the
    shingle count, and n_bits=None produces the exact fixed-size result
    (the verify join makes output invariant to the bitmap size)."""
    from pyspark.sql import functions as F

    from paradump_spark.operators.decontam import (
        _BLOOM_AUTO_FLOOR_BITS,
        auto_bloom_bits,
        contamination_bloom,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)

    bits = auto_bloom_bits(bench)
    assert bits == _BLOOM_AUTO_FLOOR_BITS  # small set -> floor binds
    assert bits & (bits - 1) == 0

    # growth: a synthetic frame with ~2M distinct shingles must size
    # past the floor (14 bits/shingle, next pow2)
    wide = spark.range(120000).select(
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{i}x"), F.col("id").cast("string"))
                for i in range(8)
            ],
        ).alias("text")
    )
    grown = auto_bloom_bits(wide)
    assert grown > _BLOOM_AUTO_FLOOR_BITS
    assert grown & (grown - 1) == 0

    got_auto = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_bloom(corpus, bench, n_bits=None).collect()
    }
    got_fixed = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_bloom(corpus, bench, n_bits=1 << 22).collect()
    }
    assert got_auto == got_fixed and got_auto
