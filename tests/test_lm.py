"""Bigram LM perplexity scoring (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.lm import (
    lm_score,
    self_perplexity,
    train_bigram_lm,
)


@pytest.fixture()
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "dogs bark"),
        (4, "x"),          # single token: no bigrams
        (5, "   "),        # empty after trim
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_model(texts, lam=0.8):
    """Independent Python reference of the interpolated bigram LM."""
    uni, bi = {}, {}
    for t in texts:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = sum(uni.values())
    v = len(uni)

    def logp(a, b):
        p = 0.0
        if (a, b) in bi:
            p += lam * bi[(a, b)] / uni[a]
        p += (1 - lam) * (uni.get(b, 0) + 1.0) / (n + v)
        return round(math.log(p), 9)

    return logp


def test_matches_python_reference(spark, tiny):
    texts = [r["text"] for r in tiny.select("text").collect()]
    ref_logp = _py_model(texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_token"])
        for r in self_perplexity(tiny).collect()
    }
    ln2 = 0.6931471805599453
    for doc_id, text in [(1, texts[0]), (2, texts[1]), (3, texts[2])]:
        toks = text.split()
        lps = [ref_logp(a, b) for a, b in zip(toks, toks[1:])]
        want_bits = round(-sum(lps) / len(lps) / ln2, 6)
        n, bits = got[doc_id]
        assert n == len(lps)
        assert bits == pytest.approx(want_bits, abs=2e-6)
    # degenerate docs produce no score rows
    assert 4 not in got and 5 not in got


def test_unseen_bigram_uses_backoff(spark, tiny):
    model, backoff, floor = train_bigram_lm(tiny)
    new = spark.createDataFrame(
        [(10, "cat the")],  # both tokens known, bigram never seen
        ["doc_id", "text"],
    )
    scored = lm_score(new, model, backoff, floor).collect()
    assert len(scored) == 1
    # backoff term only: (1-lam)*(c1('the')+1)/(N+V)
    texts = [r["text"] for r in tiny.select("text").collect()]
    uni = {}
    for t in texts:
        for w in t.split():
            uni[w] = uni.get(w, 0) + 1
    n, v = sum(uni.values()), len(uni)
    want = round(math.log(0.2 * (uni["the"] + 1) / (n + v)), 9)
    ln2 = 0.6931471805599453
    assert scored[0]["bits_per_token"] == pytest.approx(
        round(-want / ln2, 6), abs=2e-6
    )


def test_oov_token_uses_floor(spark, tiny):
    model, backoff, floor = train_bigram_lm(tiny)
    new = spark.createDataFrame([(11, "zzz qqq")], ["doc_id", "text"])
    scored = lm_score(new, model, backoff, floor).collect()
    texts = [r["text"] for r in tiny.select("text").collect()]
    uni = {}
    for t in texts:
        for w in t.split():
            uni[w] = uni.get(w, 0) + 1
    n, v = sum(uni.values()), len(uni)
    want = round(math.log(0.2 / (n + v)), 9)
    ln2 = 0.6931471805599453
    assert scored[0]["bits_per_token"] == pytest.approx(
        round(-want / ln2, 6), abs=2e-6
    )


def test_gibberish_scores_worse_on_heldout_model(spark, sf_dir):
    """The CCNet usage: train on a trusted corpus, score NEW documents —
    gibberish (all-OOV) must cost far more bits/token than corpus-typical
    text (seen bigrams)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model, backoff, floor = train_bigram_lm(docs)
    typical_text = docs.select("text").first()["text"]
    new = spark.createDataFrame(
        [
            (1, "zq xv qj vw jx wq zx qv jz"),  # OOV gibberish
            (2, typical_text),                  # in-distribution
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["bits_per_token"]
        for r in lm_score(new, model, backoff, floor).collect()
    }
    assert got[1] > got[2] + 3.0  # OOV floor is many bits above seen text


def test_no_python_udf_and_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = self_perplexity(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_shuffle_fallback_equal(spark, tiny):
    a = {
        (r["doc_id"], r["n_bigrams"], r["bits_per_token"])
        for r in self_perplexity(tiny, broadcast_model=True).collect()
    }
    b = {
        (r["doc_id"], r["n_bigrams"], r["bits_per_token"])
        for r in self_perplexity(tiny, broadcast_model=False).collect()
    }
    assert a == b
