"""PII redaction, Gopher quality rules, and n-gram duplication profile —
crafted-vector tests plus DuckDB oracle parity (the synthetic documents
table has no PII/newlines, so behavior is proven on crafted fixtures and
the engine-parity contract on real tables is proven by the shared oracle
SQL builders the driver also runs)."""

import duckdb
import pandas as pd
import pytest

from paradump_spark.operators import pii as P
from paradump_spark.operators import quality_rules as Q
from paradump_spark.operators.dedup import ngram_duplication_profile

PII_DOCS = [
    (1, "mail a@b.co or j.doe+x@exa-mple.org today"),
    (2, "ip 10.0.0.1 and 255.255.255.255 but not 1.2.3"),
    (3, "ssn 123-45-6789 card 4111 1111 1111 1111"),
    (4, "call +1 (415) 555-2671 or 415-555-2671"),
    (5, "clean text with no identifiers at all"),
    (6, ""),
]

GOPHER_DOCS = [
    # long clean doc: passes everything (50+ words incl. stopwords)
    (1, " ".join(["the quick brown fox jumps over and that dog runs with it to be of"] * 5)),
    # too short
    (2, "tiny doc the and of that have with to be"),
    # bullet-heavy
    (3, "\n".join(["- item one the and of"] * 10)),
    # ellipsis-heavy
    (4, "\n".join(["the and of that have something..."] * 10)),
    # symbol-heavy
    (5, "the and of " + "# " * 50),
    # numeric words (fails alpha fraction)
    (6, " ".join(["123 456 789 the and"] * 20)),
    (7, ""),
]


def _duck(rows):
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW docs AS SELECT * FROM docs_pd")
    return con


def _cmp(spdf, opdf, key="doc_id"):
    a = spdf.toPandas().sort_values(key).reset_index(drop=True)
    b = opdf.sort_values(key).reset_index(drop=True)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pii_stats_matches_duckdb_oracle(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    con = _duck(PII_DOCS)
    _cmp(
        P.pii_stats(df, "doc_id", "text"),
        con.execute(P.oracle_pii_sql("docs", "doc_id", "text")).df(),
    )


def test_pii_counts_expected_values(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in P.pii_stats(df, "doc_id", "text").collect()
    }
    assert got[1]["n_email"] == 2 and got[1]["has_pii"]
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_ssn"] == 1 and got[3]["n_credit_card"] == 1
    assert got[4]["n_phone"] == 2
    assert got[5]["n_pii"] == 0 and not got[5]["has_pii"]
    assert got[6]["n_pii"] == 0


def test_redaction_is_ordered_and_total(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    red = {
        r["doc_id"]: r["text"]
        for r in P.redact_pii(df, "text").collect()
    }
    assert red[1] == "mail <EMAIL> or <EMAIL> today"
    assert red[3] == "ssn <SSN> card <CREDIT_CARD>"
    assert "<PHONE>" in red[4] and "555" not in red[4]
    assert red[5] == PII_DOCS[4][1]  # untouched
    # redacted text carries no residual matches of any class
    again = P.pii_stats(
        P.redact_pii(df, "text"), "doc_id", "text"
    ).agg({"n_pii": "sum"}).collect()[0][0]
    assert again == 0


def test_pii_summary_rollup(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    row = P.pii_summary(df, "doc_id", "text").collect()[0].asDict()
    assert row["n_docs"] == 6
    assert row["docs_with_pii"] == 4
    assert row["total_email"] == 2
    assert row["docs_email"] == 1


def test_gopher_rules_match_duckdb_oracle(spark):
    df = spark.createDataFrame(GOPHER_DOCS, ["doc_id", "text"])
    con = _duck(GOPHER_DOCS)
    _cmp(
        Q.gopher_rules(df, "doc_id", "text"),
        con.execute(Q.oracle_gopher_sql("docs", "doc_id", "text")).df(),
    )


def test_gopher_rules_flags(spark):
    df = spark.createDataFrame(GOPHER_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in Q.gopher_rules(df, "doc_id", "text").collect()
    }
    assert got[1]["keep"]
    assert not got[2]["pass_word_count"]
    assert not got[3]["pass_bullet_lines"]
    assert not got[4]["pass_ellipsis_lines"]
    assert not got[5]["pass_symbol_ratio"]
    assert not got[6]["pass_alpha_words"]
    assert not got[7]["keep"] and got[7]["n_words"] == 0
    kept = Q.gopher_filter(df, "doc_id", "text").select("doc_id").collect()
    assert {r[0] for r in kept} == {1}


def test_ngram_duplication_profile(spark):
    rows = [
        (1, "a b c d e"),          # shares 'a b c'/'b c d'/'c d e' with 2
        (2, "a b c d e"),          # exact dup of 1
        (3, "x y z w"),            # unique
        (4, "a b c q r"),          # shares only 'a b c'
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_duplication_profile(df, "doc_id", "text", 3).collect()
    }
    assert got[1]["n_grams"] == 3 and got[1]["n_shared_grams"] == 3
    assert got[2]["shared_frac"] == 1.0
    assert got[3]["n_shared_grams"] == 0
    assert got[4]["n_grams"] == 3 and got[4]["n_shared_grams"] == 1
    assert got[4]["shared_frac"] == pytest.approx(0.333333)


def test_ngram_duplication_short_doc_not_dropped(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
    got = ngram_duplication_profile(df, "doc_id", "text", 3).collect()
    assert len(got) == 2  # sub-n docs shingle to their full text
    assert all(r["shared_frac"] == 1.0 for r in got)


def test_tfidf_top_terms_semantics(spark):
    from paradump_spark.operators.text_analysis import tfidf_top_terms

    rows = [
        (1, "apple apple banana common common"),
        (2, "banana cherry common common"),
        (3, "durian common common common"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["tfidf"])
        for r in tfidf_top_terms(df, "doc_id", "text", 2).collect()
    }
    # doc 1: apple tf=2 x idf(df=1)=ln(2)+1 beats common tf=2 x idf 1
    assert got[(1, 1)][0] == "apple"
    # doc 3: common tf=3 x idf 1 = 3.0 beats durian 1 x 1.693
    assert got[(3, 1)] == ("common", 3.0)
    assert got[(3, 2)][0] == "durian"
    # 'common' (df=3) scores idf=ln(4/4)+1=1 -> tfidf == its tf
    common = [v for v in got.values() if v[0] == "common"]
    assert all(abs(s - round(s)) < 1e-9 for _, s in common)
    assert len(got) == 6  # k=2 per doc
