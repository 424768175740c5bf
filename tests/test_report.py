"""Corpus datasheet (operators/report.py + CLI report verb)."""

import json

from pyspark.sql import functions as F

from paradump_spark.operators.report import corpus_report


def test_report_exact_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "web"),
            (2, "alpha beta gamma", "web"),      # exact dup of 1
            (3, "delta", "books"),
            (4, None, "books"),                  # NULL text
        ],
        "doc_id long, text string, source string",
    )
    card = corpus_report(docs, breakdown_cols=("source",))
    assert card["n_docs"] == 4
    assert card["n_null_text"] == 1
    assert card["n_tokens"] == 7
    assert card["n_chars"] == len("alpha beta gamma") * 2 + len("delta")
    # 3 non-null texts, 2 distinct -> 1/3 dup rate
    assert card["exact_dup_rate"] == round(1 / 3, 6)
    assert card["by_source"]["web"] == {"n_docs": 2, "n_tokens": 6}
    assert card["by_source"]["books"] == {"n_docs": 2, "n_tokens": 1}
    # tiny docs fail Gopher's min-word rule
    assert card["gopher_keep_rate"] == 0.0
    assert card["pii"]["n_docs_with_pii"] == 0
    json.dumps(card)  # must be JSON-serializable


def test_report_pii_and_percentiles(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    card = corpus_report(docs, breakdown_cols=("source", "lang"))
    assert card["n_docs"] == docs.count()
    p = card["token_percentiles"]
    assert p["p10"] <= p["p50"] <= p["p90"] <= p["p99"]
    assert sum(v["n_docs"] for v in card["by_source"].values()) == card["n_docs"]
    assert card["pii"]["n_matches"] >= card["pii"]["n_docs_with_pii"]


def test_report_breakdown_truncation(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} filler", f"src{i}") for i in range(10)],
        "doc_id long, text string, source string",
    )
    card = corpus_report(docs, breakdown_cols=("source",), max_groups=3)
    assert len(card["by_source"]) == 3
    assert card["by_source_truncated_at"] == 3


def test_report_cli(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    out = str(tmp_path / "card.json")
    rc = main(
        [
            "report",
            "--directory", sf_dir,
            "--by", "source",
            "--output", out,
            "--no-dup-rate",
        ]
    )
    assert rc == 0
    card = json.load(open(out))
    assert "exact_dup_rate" not in card
    assert card["n_docs"] > 0 and "by_source" in card
