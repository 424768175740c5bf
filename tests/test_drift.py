"""PSI drift detection (operators/drift.py) + LM perplexity buckets."""

import math

import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.drift import (
    bin_id,
    drift_report,
    histogram,
    psi_report,
    psi_value,
)


def _uniform(spark, n, shift=0.0):
    return spark.range(n).select(
        ((F.col("id") % 100).cast("double") + shift).alias("v")
    )


def test_bin_edges_and_outliers(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (49.9,), (99.9,), (100.0,), (250.0,), (None,)],
        "v double",
    )
    got = {
        r["v"]: r["b"]
        for r in df.where(F.col("v").isNotNull())
        .select("v", bin_id(F.col("v"), 0.0, 100.0, 10).alias("b"))
        .collect()
    }
    assert got[-5.0] == 0       # underflow clamps to first bin
    assert got[0.0] == 0
    assert got[49.9] == 4
    assert got[99.9] == 9
    assert got[100.0] == 9      # at-hi clamps to last bin
    assert got[250.0] == 9      # overflow clamps
    # NULLs excluded from histograms
    assert histogram(df, "v", 0.0, 100.0, 10).agg(
        F.sum("n_rows")
    ).collect()[0][0] == 6


def test_identical_distributions_near_zero_psi(spark):
    a = _uniform(spark, 5000)
    assert psi_value(a, _uniform(spark, 5000), "v", 0.0, 100.0) < 1e-6


def test_shifted_distribution_flags_drift(spark):
    a = _uniform(spark, 5000)
    shifted = _uniform(spark, 5000, shift=40.0)
    psi = psi_value(a, shifted, "v", 0.0, 100.0)
    assert psi > 0.25  # "broken" band


def test_psi_matches_python_reference(spark):
    base = spark.createDataFrame([(float(x),) for x in [1, 1, 2, 5, 9]], "v double")
    new = spark.createDataFrame([(float(x),) for x in [1, 8, 8, 9, 9, 9]], "v double")
    rows = psi_report(base, new, "v", 0.0, 10.0, n_bins=5).collect()
    # python reference with the same 0.5 smoothing
    import collections

    def hist(vals):
        c = collections.Counter(min(4, max(0, int(v / 10.0 * 5))) for v in vals)
        return [c.get(b, 0) for b in range(5)]

    hb, hn = hist([1, 1, 2, 5, 9]), hist([1, 8, 8, 9, 9, 9])
    tb, tn = sum(hb), sum(hn)
    want = 0.0
    for b in range(5):
        pb = (hb[b] + 0.5) / (tb + 2.5)
        pn = (hn[b] + 0.5) / (tn + 2.5)
        want += round((pn - pb) * math.log(pn / pb), 6)
    got = sum(r["psi_term"] for r in rows)
    assert got == pytest.approx(want, abs=1e-6)
    assert [r["bin"] for r in rows] == [0, 1, 2, 3, 4]  # every bin present


def test_drift_report_multi_column(spark):
    base = spark.range(1000).select(
        (F.col("id") % 10).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    new = spark.range(1000).select(
        (F.col("id") % 10).cast("double").alias("a"),
        ((F.col("id") % 7) + 5.0).alias("b"),  # b drifts, a does not
    )
    rep = {
        r["column_name"]: r["psi"]
        for r in drift_report(
            base, new, {"a": (0.0, 10.0), "b": (0.0, 12.0)}
        ).collect()
    }
    assert rep["a"] < 0.01 < rep["b"]


def test_bad_bounds_rejected(spark):
    df = _uniform(spark, 10)
    with pytest.raises(ValueError):
        histogram(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        histogram(df, "v", 0.0, 1.0, 1)
    with pytest.raises(ValueError):
        drift_report(df, df, {})


def test_perplexity_buckets(spark, sf_dir):
    from paradump_spark.operators.lm import perplexity_buckets, self_perplexity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = self_perplexity(docs)
    b = perplexity_buckets(scores, n_buckets=3)
    counts = {r["ppl_bucket"]: r["c"] for r in b.groupBy("ppl_bucket").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {1, 2, 3}
    assert max(counts.values()) - min(counts.values()) <= 1  # equal-count cut
    # bucket 1 holds the most predictable (lowest-bits) docs
    rows = b.collect()
    max_b1 = max(r["bits_per_token"] for r in rows if r["ppl_bucket"] == 1)
    min_b3 = min(r["bits_per_token"] for r in rows if r["ppl_bucket"] == 3)
    assert max_b1 <= min_b3


def test_drift_cli(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    # same catalog on both sides: stable, exit 0
    rc = main([
        "drift", "--directory", sf_dir, "--new-directory", sf_dir,
        "--table", "orders", "--column", "o_totalprice:0:600000",
    ])
    assert rc == 0
    assert "stable" in capsys.readouterr().out
    # perturbed snapshot: shift prices far beyond the band -> exit 1
    shifted_dir = str(tmp_path / "snap")
    import os
    os.makedirs(shifted_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.withColumn(
        "o_totalprice", F.col("o_totalprice") + 500000.0
    ).coalesce(1).write.parquet(f"{shifted_dir}/orders.parquet")
    rc = main([
        "drift", "--directory", sf_dir, "--new-directory", shifted_dir,
        "--table", "orders", "--column", "o_totalprice:0:600000",
    ])
    assert rc == 1
    assert "BROKEN" in capsys.readouterr().out
    import pytest
    with pytest.raises(SystemExit):
        main(["drift", "--directory", sf_dir, "--new-directory", sf_dir,
              "--table", "orders", "--column", "bad-spec"])
