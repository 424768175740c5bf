"""BPE vocabulary learning + tokenization (operators/bpe.py)."""

from pyspark.sql import functions as F

from paradump_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_encode,
    bpe_token_count,
    train_bpe,
    word_counts,
)


def _docs(spark):
    # classic Sennrich-style toy corpus
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest newest newest newest"),
        (4, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts(spark):
    got = {r["word"]: r["n"] for r in word_counts(_docs(spark)).collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_training_learns_expected_merges(spark):
    merges = train_bpe(word_counts(_docs(spark)), num_merges=10)
    # 'es' (9) then 'est' (9) then 'est</w>' (9) are the classic first
    # merges on this corpus; 'lo' (7) follows
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert ("l", "o") in merges[:5]


def test_encode_round_trip_and_eow(spark):
    merges = train_bpe(word_counts(_docs(spark)), num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "unseenword"]:
        toks = _encode_word(w, ranks)
        joined = "".join(toks)
        assert joined == w + EOW  # lossless
    # a fully-merged frequent word collapses to few symbols
    assert len(_encode_word("newest", ranks)) <= 3


def test_corpus_encode_and_count(spark):
    docs = _docs(spark)
    merges = train_bpe(word_counts(docs), num_merges=10)
    enc = bpe_encode(docs, merges)
    row = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    # doc 1: "low"×5 → each encodes to the same token list
    per_word = len(row[1]) / 5
    assert per_word == len(row[1]) // 5
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(docs, merges).collect()
    }
    assert counts[1] == len(row[1])
    # token budget shrinks vs characters but is >= word count
    assert 5 <= counts[1] < len("low low low low low")


def test_determinism_and_early_stop(spark):
    wc = word_counts(_docs(spark))
    a = train_bpe(wc, num_merges=10)
    b = train_bpe(wc, num_merges=10)
    assert a == b
    # absurd threshold: nothing to merge
    assert train_bpe(wc, num_merges=10, min_pair_count=10**9) == []


def test_encode_on_real_corpus_is_arrow_batched(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(word_counts(docs), num_merges=50)
    out = bpe_token_count(docs, merges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    got = out.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert got > 0


def test_tokenize_cli_trains_saves_and_reuses(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    out = str(tmp_path / "toks")
    merges_path = str(tmp_path / "merges.json")
    rc = main([
        "tokenize", "--directory", sf_dir, "--output", out,
        "--num-merges", "30", "--merges", merges_path,
    ])
    assert rc == 0
    assert "30 merges" in capsys.readouterr().out
    import json
    with open(merges_path) as fh:
        saved = json.load(fh)
    assert len(saved) == 30
    # re-run loads the saved table (same result, no retrain)
    out2 = str(tmp_path / "toks2")
    rc = main([
        "tokenize", "--directory", sf_dir, "--output", out2,
        "--merges", merges_path, "--emit-tokens",
    ])
    assert rc == 0
    a = spark.read.parquet(out).orderBy("doc_id").collect()
    b = spark.read.parquet(out2).orderBy("doc_id").collect()
    assert [r["n_bpe_tokens"] for r in a] == [r["n_bpe_tokens"] for r in b]
    assert "bpe_tokens" in spark.read.parquet(out2).columns
    import pytest
    with pytest.raises(SystemExit):
        main(["tokenize", "--directory", sf_dir, "--output", out,
              "--num-merges", "0"])
