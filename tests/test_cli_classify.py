"""CLI: classify subcommand + dedup --method semantic."""

import pytest
from pyspark.sql import functions as F

from paradump_spark.cli import build_parser, main, validate


def _args(argv):
    return build_parser().parse_args(argv)


@pytest.mark.parametrize(
    "argv",
    [
        # neither --label-col nor --weights
        ["classify", "--directory", "/x", "--output", "/y"],
        ["classify", "--directory", "/x", "--output", "/y",
         "--label-col", "y", "--epochs", "0"],
        # 0 now means auto-k (round 7); negatives still fail
        ["dedup", "--directory", "/x", "--output", "/y",
         "--method", "semantic", "--num-clusters", "-4"],
    ],
)
def test_classify_validation(argv):
    with pytest.raises(SystemExit) as e:
        validate(_args(argv))
    assert e.value.code not in (0, None)


def test_cli_classify_train_save_score_roundtrip(spark, sf_dir, tmp_path, capsys):
    # label: presence of the token "vector" — learnable from text
    labeled = tmp_path / "labeled"
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "y",
            F.array_contains(F.split(F.lower("text"), "\\s+"), "vector")
            .cast("double"),
        )
        .write.parquet(str(labeled / "documents.parquet"))
    )
    wpath = str(tmp_path / "weights")
    rc = main([
        "classify", "--directory", str(labeled), "--output",
        str(tmp_path / "scored"), "--label-col", "y", "--weights", wpath,
        "--n-buckets", "4096", "--train-cap", "300",
        "--epochs", "150", "--lr", "20.0",
    ])
    assert rc == 0
    assert "scored" in capsys.readouterr().out
    scored = spark.read.parquet(str(tmp_path / "scored"))
    acc = (
        scored.select(
            ((F.col("score") > 0.5).cast("double") == F.col("y"))
            .cast("double").alias("ok")
        ).agg(F.avg("ok")).first()[0]
    )
    assert acc > 0.9, acc
    # score-only run with the saved weights reproduces the same scores
    rc = main([
        "classify", "--directory", str(labeled), "--output",
        str(tmp_path / "scored2"), "--weights", wpath,
        "--n-buckets", "4096",
    ])
    assert rc == 0
    s1 = {r["doc_id"]: round(r["score"], 9)
          for r in scored.select("doc_id", "score").collect()}
    s2 = {r["doc_id"]: round(r["score"], 9)
          for r in spark.read.parquet(str(tmp_path / "scored2"))
          .select("doc_id", "score").collect()}
    assert s1 == s2


def test_cli_dedup_semantic_runs(spark, sf_dir, tmp_path, capsys):
    rc = main([
        "dedup", "--directory", sf_dir, "--table", "embeddings",
        "--id-col", "vec_id", "--vec-col", "embedding",
        "--method", "semantic", "--threshold", "0.99",
        "--num-clusters", "8", "--output", str(tmp_path / "kept"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "method=semantic" in out
    kept = spark.read.parquet(str(tmp_path / "kept"))
    n_in = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert 0 < kept.count() <= n_in
