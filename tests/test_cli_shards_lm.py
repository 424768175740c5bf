"""CLI: export-shards / verify-shards / score-lm / dedup --method lines."""

import glob
import os

import pytest

from paradump_spark.cli import main


def test_export_and_verify_shards(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "shards")
    rc = main([
        "export-shards", "--directory", sf_dir, "--output", out,
        "--n-shards", "4", "--sort-col", "doc_id",
    ])
    assert rc == 0
    assert "into 4 shards" in capsys.readouterr().out
    rc = main(["verify-shards", "--path", out])
    assert rc == 0
    assert "all 4 shards faithful" in capsys.readouterr().out
    # tamper -> exit 1
    victim = glob.glob(os.path.join(out, "shard=2", "*.parquet"))[0]
    os.remove(victim)
    rc = main(["verify-shards", "--path", out])
    assert rc == 1
    assert "FAILED" in capsys.readouterr().out


def test_export_shards_validation(tmp_path):
    with pytest.raises(SystemExit):
        main([
            "export-shards", "--directory", "/x", "--output", str(tmp_path),
            "--n-shards", "0",
        ])


def test_score_lm_self(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "scores")
    rc = main([
        "score-lm", "--directory", sf_dir, "--output", out,
    ])
    assert rc == 0
    assert "bits/token p50=" in capsys.readouterr().out
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {"doc_id", "n_bigrams", "bits_per_token"}


def test_score_lm_filter_and_validation(spark, sf_dir, tmp_path, capsys):
    with pytest.raises(SystemExit):
        main([
            "score-lm", "--directory", sf_dir,
            "--output", str(tmp_path / "x"), "--lam", "1.5",
        ])
    out = str(tmp_path / "scores")
    rc = main([
        "score-lm", "--directory", sf_dir, "--output", out,
        "--max-bits", "999",
    ])
    assert rc == 0
    kept = spark.read.parquet(out + "_kept")
    scored = spark.read.parquet(out)
    # threshold far above any score: every SCORED doc is kept
    assert kept.count() == scored.count()


def test_dedup_lines_method(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "clean")
    rc = main([
        "dedup", "--directory", sf_dir, "--output", out,
        "--method", "lines", "--max-docs", "3",
    ])
    assert rc == 0
    assert "method=lines" in capsys.readouterr().out
    back = spark.read.parquet(out)
    assert "n_removed_lines" in back.columns
    # single-line corpus: a full-text line duplicated across docs only
    # if the text repeats; row count must be preserved (lines mode
    # rewrites text, never drops documents)
    n_src = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert back.count() == n_src


def test_score_lm_model_persistence(spark, sf_dir, tmp_path):
    """Train+save, then score-only with the saved model: identical
    scores (the CCNet serving shape — model frozen, corpora rotate)."""
    out1 = str(tmp_path / "s1")
    model_dir = str(tmp_path / "model")
    assert main([
        "score-lm", "--directory", sf_dir, "--output", out1,
        "--save-model", model_dir,
    ]) == 0
    assert os.path.isdir(os.path.join(model_dir, "model"))
    out2 = str(tmp_path / "s2")
    assert main([
        "score-lm", "--directory", sf_dir, "--output", out2,
        "--model", model_dir,
    ]) == 0
    a = {(r["doc_id"], r["bits_per_token"])
         for r in spark.read.parquet(out1).collect()}
    b = {(r["doc_id"], r["bits_per_token"])
         for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_chunk_command(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    out = str(tmp_path / "chunks")
    rc = main(
        [
            "chunk",
            "--directory", sf_dir,
            "--output", out,
            "--window", "64",
            "--stride", "48",
        ]
    )
    assert rc == 0
    assert "chunks" in capsys.readouterr().out
    back = spark.read.parquet(out)
    assert back.columns == ["doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text"]
    assert back.count() > 0
    assert back.agg({"n_chunk_tokens": "max"}).collect()[0][0] <= 64


def test_chunk_validation(tmp_path):
    import pytest as _pytest

    from paradump_spark.cli import main

    base = ["chunk", "--directory", "/nonexistent", "--output", str(tmp_path / "x")]
    with _pytest.raises(SystemExit):
        main(base + ["--window", "0"])
    with _pytest.raises(SystemExit):
        main(base + ["--window", "8", "--stride", "9"])


def test_dedup_auto_bands(spark, sf_dir, tmp_path, capsys):
    """--auto-bands must produce the same exact-verified keep-set class
    (a valid dedup) and run end-to-end."""
    from paradump_spark.cli import main

    out = str(tmp_path / "dd_auto")
    rc = main(
        [
            "dedup",
            "--directory", sf_dir,
            "--output", out,
            "--method", "minhash",
            "--threshold", "0.8",
            "--auto-bands",
        ]
    )
    assert rc == 0
    n = spark.read.parquet(out).count()
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert 0 < n <= src
