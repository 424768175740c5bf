"""Text normalization (operators/textnorm.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.textnorm import normalize_text


def _dirty(spark):
    rows = [
        (1, "plain text stays"),
        (2, "bell\x07 and null\x00 gone"),
        (3, "zero​width‍ and bom﻿ out"),
        (4, "runs   of\t\twhitespace  collapse"),
        (5, "  trimmed edges \n next line \n"),
        (6, None),
        (7, "tabs\tand\nnewlines kept\nas structure"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_collapse_trim(spark):
    got = {
        r["doc_id"]: (r["text"], r["n_removed_chars"])
        for r in normalize_text(_dirty(spark), "text").collect()
    }
    assert got[1] == ("plain text stays", 0)
    assert got[2] == ("bell and null gone", 2)
    assert got[3] == ("zerowidth and bom out", 3)
    assert got[4] == ("runs of whitespace collapse", 4)
    assert got[5] == ("trimmed edges\nnext line", 6)
    assert got[6] == (None, None)
    assert got[7][0] == "tabs and\nnewlines kept\nas structure"


def test_idempotent(spark):
    once = normalize_text(_dirty(spark), "text")
    twice = normalize_text(once.select("doc_id", "text"), "text")
    assert twice.agg(F.sum("n_removed_chars")).collect()[0][0] == 0


def test_nfc_matches_duckdb(spark):
    """NFC composition agrees with DuckDB's nfc_normalize on combining
    sequences, precomposed forms, and mixed scripts."""
    rows = [
        (1, "école"),            # e + combining acute -> é
        (2, "école"),              # already precomposed
        (3, "Å"),                 # A + ring -> Å
        (4, "ascii only"),
        (5, "können über"),  # o/u + diaeresis
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in normalize_text(df, "text", nfc=True).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        want = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
    assert got[1] == got[2] == "école"


def test_dedup_signatures_converge_after_normalize(spark):
    """The point of the pass: visually-identical docs hash identically
    only after normalization."""
    df = spark.createDataFrame(
        [(1, "same  text​ here"), (2, "same text here")],
        "doc_id long, text string",
    )
    raw = df.select(F.md5("text").alias("h")).distinct().count()
    norm = (
        normalize_text(df, "text")
        .select(F.md5("text").alias("h"))
        .distinct()
        .count()
    )
    assert raw == 2 and norm == 1


def test_plan_is_jvm_only_without_nfc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        normalize_text(docs, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_scrub_cli_normalize_flag(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    out = str(tmp_path / "scrubbed")
    rc = main([
        "scrub", "--directory", sf_dir, "--output", out,
        "--normalize", "--no-filter",
    ])
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() > 0
    # normalized output is a fixed point
    renorm = normalize_text(back.select("doc_id", "text"), "text")
    assert renorm.agg(F.sum("n_removed_chars")).collect()[0][0] == 0
