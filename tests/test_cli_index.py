"""ANN index CLI verbs: build / append / query over the embeddings
table, both plain IVF and IVF-PQ (auto-detected on append/query)."""

import pytest
from pyspark.sql import functions as F

from paradump_spark.cli import main


def test_index_build_append_query_ivf(spark, sf_dir, tmp_path, capsys):
    idx = str(tmp_path / "ivf_idx")
    rc = main(
        [
            "index-build",
            "--directory", sf_dir,
            "--output", idx,
            "--num-cells", "8",
        ]
    )
    assert rc == 0
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    assert spark.read.parquet(idx + "/corpus").count() == n

    out = str(tmp_path / "res")
    rc = main(
        [
            "index-query",
            "--index", idx,
            "--directory", sf_dir,
            "--output", out,
            "--k", "5",
            "--nprobe", "8",
            "--limit-queries", "6",
        ]
    )
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert res.count() == 6 * 5
    # rank 1 at nprobe=all is the query itself (cosine 1)
    self_hits = res.where(
        (F.col("rank") == 1) & (F.col("query_id") == F.col("neighbor_id"))
    )
    assert self_hits.count() == 6


def test_index_build_pq_append_and_query(spark, sf_dir, tmp_path, capsys):
    # build on even ids only, then append the odd half via the CLI
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half_dir = str(tmp_path / "half")
    emb.where(F.col("vec_id") % 2 == 0).write.parquet(
        half_dir + "/embeddings.parquet"
    )
    rest_dir = str(tmp_path / "rest")
    emb.where(F.col("vec_id") % 2 == 1).write.parquet(
        rest_dir + "/embeddings.parquet"
    )
    idx = str(tmp_path / "pq_idx")
    assert main(
        [
            "index-build",
            "--directory", half_dir,
            "--output", idx,
            "--num-cells", "4",
            "--pq", "--m", "8", "--ksub", "64",
        ]
    ) == 0
    assert main(
        [
            "index-append",
            "--directory", rest_dir,
            "--index", idx,
        ]
    ) == 0
    assert spark.read.parquet(idx + "/corpus").count() == emb.count()
    out = str(tmp_path / "pq_res")
    assert main(
        [
            "index-query",
            "--index", idx,
            "--directory", sf_dir,
            "--output", out,
            "--k", "3",
            "--nprobe", "4",
            "--rescore", "50",
            "--limit-queries", "4",
        ]
    ) == 0
    assert spark.read.parquet(out).count() == 4 * 3


def test_index_cli_validation(tmp_path):
    base = ["index-build", "--directory", "/nope", "--output", str(tmp_path / "i")]
    with pytest.raises(SystemExit):
        main(base + ["--num-cells", "0"])
    with pytest.raises(SystemExit):
        main(base + ["--residual"])  # without --pq
    with pytest.raises(SystemExit):
        main(
            [
                "index-query", "--index", "/nope", "--directory", "/nope",
                "--output", str(tmp_path / "o"), "--k", "0",
            ]
        )


def test_index_stats_cli(spark, sf_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx_for_stats")
    assert main(
        ["index-build", "--directory", sf_dir, "--output", idx,
         "--num-cells", "4"]
    ) == 0
    capsys.readouterr()
    assert main(["index-stats", "--index", idx]) == 0
    out = capsys.readouterr().out
    assert out.count("cell ") <= 4 and "imbalance=" in out
    assert "suggested for" in out and "rescore=" in out


def test_index_rebuild_cli(spark, sf_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx_for_rebuild")
    assert main(
        ["index-build", "--directory", sf_dir, "--output", idx,
         "--num-cells", "2", "--refine-iters", "0"]
    ) == 0
    capsys.readouterr()
    # 2 cells -> at least one holds >= 50% -> split at --max-share 0.4
    assert main(
        ["index-rebuild", "--index", idx, "--max-share", "0.4",
         "--split-factor", "2"]
    ) == 0
    out = capsys.readouterr().out
    assert "index-rebuild:" in out and "split cell" in out
    # bad flags fail loudly, before any Spark work
    assert main(["index-rebuild", "--index", idx, "--max-share", "1.5"]) == 2
    assert main(["index-rebuild", "--index", idx, "--split-factor", "1"]) == 2


def test_cli_knn_edges_and_components(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    edges = str(tmp_path / "edges")
    assert main([
        "knn", "--directory", sf_dir, "--table", "embeddings",
        "--id-col", "vec_id", "--vec-col", "embedding",
        "--k", "3", "--num-cells", "8", "--nprobe", "8",
        "--output", edges,
    ]) == 0
    out = capsys.readouterr().out
    assert "knn edges=" in out
    df = spark.read.parquet(edges)
    assert set(df.columns) == {"query_id", "neighbor_id", "rank", "cosine"}
    assert df.where("query_id = neighbor_id").count() == 0  # self excluded

    comp = str(tmp_path / "comp")
    assert main([
        "knn", "--directory", sf_dir, "--table", "embeddings",
        "--id-col", "vec_id", "--vec-col", "embedding",
        "--k", "3", "--num-cells", "8", "--nprobe", "8",
        "--threshold", "0.99", "--components", "--output", comp,
    ]) == 0
    assert "components=" in capsys.readouterr().out
    cdf = spark.read.parquet(comp)
    assert "component" in cdf.columns
    assert cdf.where("component IS NULL").count() == 0

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="threshold"):
        main([
            "knn", "--directory", sf_dir, "--components",
            "--output", str(tmp_path / "x"),
        ])
