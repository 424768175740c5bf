"""Text/vector function unit tests with known expected values."""

import hashlib

import pytest
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX
from paradump_spark.functions import vectors as V


def _one(spark, expr, text="the quick brown fox jumps"):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("v"))
        .first()["v"]
    )


def test_tokens_filter_empties(spark):
    assert _one(spark, TX.tokens("text"), "  a   b  ") == ["a", "b"]
    assert _one(spark, TX.token_count("text"), "") == 0


def test_bpe_token_count(spark):
    # words + punctuation marks count separately
    assert _one(spark, TX.bpe_token_count("text"), "a,b c!") == 5


def test_shingles(spark):
    assert _one(spark, TX.word_shingles("text", 3), "a b c d") == ["a b c", "b c d"]
    # short doc -> one shingle with everything
    assert _one(spark, TX.word_shingles("text", 3), "a b") == ["a b"]


def test_minhash_matches_python(spark):
    text = "a b c d e"
    shingles = ["a b c", "b c d", "c d e"]

    def base(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % TX.MINHASH_P

    expected = []
    for k in range(4):
        a, b = TX.minhash_params(k)
        expected.append(min((base(s) * a + b) % TX.MINHASH_P for s in shingles))
    got = _one(spark, TX.minhash_signature(TX.word_shingles("text", 3), 4), text)
    assert got == expected


def test_token_hash60_matches_python(spark):
    exp = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    got = _one(spark, TX.token_hash60(F.lit("hello")))
    assert got == exp


def test_fingerprint_matches_python(spark):
    text = "abc"
    acc = 0
    for ch in text:
        acc = (acc * 31 + ord(ch)) % TX.FINGERPRINT_MOD
    assert _one(spark, TX.fingerprint("text"), text) == acc


def test_lang_id_english(spark):
    assert (
        _one(spark, TX.lang_id("text"), "the cat and the dog in the house") == "en"
    )


def test_lang_id_german(spark):
    assert _one(spark, TX.lang_id("text"), "der hund und die katze ist") == "de"


def test_char_class_ratio(spark):
    assert _one(spark, TX.char_class_ratio("text", "[A-Za-z]"), "ab12") == 0.5
    assert _one(spark, TX.char_class_ratio("text", "[A-Za-z]"), "") == 0.0


def test_stopword_ratio(spark):
    assert _one(spark, TX.stopword_ratio("text"), "the fox") == 0.5


@pytest.mark.parametrize(
    "a,b,expected",
    [([1.0, 0.0], [1.0, 0.0], 1.0), ([1.0, 0.0], [0.0, 1.0], 0.0)],
)
def test_cosine(spark, a, b, expected):
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    assert got == pytest.approx(expected)


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    row = df.select(
        V.dot(F.col("a"), F.col("a")).alias("d"), V.norm(F.col("a")).alias("n")
    ).first()
    assert row["d"] == 25.0 and row["n"] == 5.0


def test_zero_vector_cosine_is_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).first()["c"] == 0.0


def test_sign_sketch_deterministic(spark):
    df = spark.createDataFrame([([1.0, -2.0, 3.0],)], "a array<double>")
    s1 = df.select(V.sign_sketch(F.col("a"), 8).alias("s")).first()["s"]
    s2 = df.select(V.sign_sketch(F.col("a"), 8).alias("s")).first()["s"]
    assert s1 == s2 and 0 <= s1 < 256


def test_repetition_ratios_known_values(spark):
    from paradump_spark.operators.text_analysis import repetition_ratios

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),        # bigrams: ab,ba,ab,ba -> 2/4 dup
            (2, "x y z"),            # all distinct
            (3, "w"),                # too short for any n-gram
            (4, "l1\nl2\nl1"),       # duplicate line
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in repetition_ratios(df, "doc_id", "text").collect()}
    assert got[1]["dup_2gram_frac"] == 0.5
    assert got[1]["dup_3gram_frac"] == pytest.approx(1.0 - 2.0 / 3.0, abs=1e-6)
    assert got[2]["dup_2gram_frac"] == 0.0
    assert got[3]["dup_2gram_frac"] == 0.0 and got[3]["dup_3gram_frac"] == 0.0
    assert got[4]["dup_line_frac"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert got[1]["dup_line_frac"] == 0.0


def test_shingles_match_per_index_formulation(spark):
    """The zip_with formulation must stay bit-equal to the textbook
    transform(sequence) one it replaced for speed (the transform form
    re-tokenizes per shingle — see the word_shingles docstring)."""

    def reference(col, n):
        t = TX.tokens(col)
        k = F.greatest(F.size(t) - F.lit(n) + F.lit(1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )

    cases = [
        "", "  ", "one", "one two", "one two three", "a b c d e f g",
        "x\t y\n z  w", "Hello, world! Multi  space", "lead trail",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    for n in (1, 2, 3, 5):
        got = [r.v for r in df.select(TX.word_shingles("text", n).alias("v")).collect()]
        want = [r.v for r in df.select(reference("text", n).alias("v")).collect()]
        assert got == want, n
