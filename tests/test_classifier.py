"""Hashed-feature linear classifier: serving parity + training sanity."""

import duckdb
from pyspark.sql import functions as F

from paradump_spark.operators.classifier import (
    hashed_token_features,
    score_linear,
    train_linear_classifier,
)

N_BUCKETS = 4096
# binary-exact deterministic demo weights: multiples of 1/1024 in [-0.5, 0.5]
_W = "((bucket * 2654435761) % 1025 - 512) / 1024.0"


def _weights(spark):
    return spark.range(N_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 2654435761) % 1025 - 512).cast("double") / 1024.0,
    ).toDF("bucket", "weight")


def test_hashed_features_shape(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, None)], "id long, text string"
    )
    rows = hashed_token_features(df, "id", "text", N_BUCKETS).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r.tf)
    assert sorted(by_id[1]) == [1, 2]      # "a" twice, "b" once
    assert 2 not in by_id and 3 not in by_id


def test_score_linear_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: r.score
        for r in score_linear(
            docs, _weights(spark), "doc_id", "text", N_BUCKETS
        )
        .select("doc_id", F.round("score", 6).alias("score"))
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(f"""
            WITH t AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x <> '') AS toks
                   FROM read_parquet('{sf_dir}/documents.parquet')),
            e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
            b AS (SELECT doc_id,
                    ('0x' || substr(md5('feat|' || tok), 1, 15))::BIGINT % {N_BUCKETS} AS bucket
                  FROM e),
            s AS (SELECT doc_id, avg({_W}) AS m FROM b GROUP BY doc_id)
            SELECT d.doc_id, round(1.0 / (1.0 + exp(-coalesce(s.m, 0.0))), 6)
            FROM read_parquet('{sf_dir}/documents.parquet') d
            LEFT JOIN s USING (doc_id)
        """).fetchall()
    )
    assert got == want


def test_score_linear_empty_doc_scores_sigmoid_bias(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "id long, text string")
    rows = score_linear(
        df, _weights(spark), "id", "text", N_BUCKETS, bias=0.0
    ).collect()
    assert {r.id: round(r.score, 6) for r in rows} == {1: 0.5, 2: 0.5}


def test_score_plan_no_udf_and_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        score_linear(docs, _weights(spark), "doc_id", "text", N_BUCKETS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_train_learns_token_signal(spark, sf_dir):
    # the synthetic corpus shares one vocabulary across langs (lang is
    # NOT learnable from text), so train on a label the text determines:
    # presence of the token "vector"
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "y",
            F.array_contains(F.split(F.lower("text"), "\\s+"), "vector")
            .cast("double"),
        )
    )
    weights, bias = train_linear_classifier(
        docs, "doc_id", "text", "y",
        n_buckets=N_BUCKETS, train_cap=300, epochs=200, lr=20.0,
    )
    scored = score_linear(
        docs, weights, "doc_id", "text", N_BUCKETS, bias=bias
    )
    acc = (
        scored.select(
            ((F.col("score") > 0.5).cast("double") == F.col("y"))
            .cast("double").alias("ok")
        ).agg(F.avg("ok")).first()[0]
    )
    assert acc > 0.95, acc


def test_calibration_report_exact_values(spark):
    from paradump_spark.operators.classifier import calibration_report

    rows = [
        (1, 0.05, 1), (2, 0.07, 0),          # bucket 0: rate 0.5
        (3, 0.95, 1), (4, 0.99, 1),          # bucket 9: rate 1.0
        (5, 1.00, 0),                        # score 1.0 clamps into 9
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    got = {r["bucket"]: r for r in calibration_report(df, "label").collect()}
    assert set(got) == {0, 9}
    assert got[0]["n_docs"] == 2 and got[0]["positive_rate"] == 0.5
    assert got[9]["n_docs"] == 3
    assert got[9]["positive_rate"] == round(2 / 3, 6)
    assert got[0]["mean_score"] == 0.06
    assert got[9]["mean_score"] == round((0.95 + 0.99 + 1.0) / 3, 6)
