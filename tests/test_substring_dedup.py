"""Cross-document duplicated-span removal (distributed exact-substring
dedup): crafted-vector semantics + DuckDB oracle parity + plan shape."""

import duckdb
import pandas as pd

from paradump_spark.operators.dedup import (
    duplicate_span_occurrences,
    oracle_remove_duplicate_spans_sql,
    remove_duplicate_spans,
)

DOCS = [
    (1, "a b c d e f"),        # keeper home for 'a b c' and the rest
    (2, "x y a b c q"),        # shares span 'a b c' at pos 2
    (3, "a b c d e f"),        # exact dup of 1: fully removed
    (4, "p q r"),              # unique single span
    (5, "p q"),                # shorter than the span: no windows
    (6, ""),                   # empty
]


def test_occurrences_and_keeper_policy(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    occ = {
        (r["doc_id"], r["pos"])
        for r in duplicate_span_occurrences(df, "doc_id", "text", 3).collect()
    }
    # doc 1 is every shared span's first home -> never removed
    assert not any(d == 1 for d, _ in occ)
    assert (2, 2) in occ          # 'a b c' inside doc 2
    assert {(3, p) for p in range(4)} <= occ  # all four windows of doc 3
    assert not any(d in (4, 5, 6) for d, _ in occ)


def test_removal_semantics(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(df, "doc_id", "text", 3).collect()
    }
    assert got[1] == ("a b c d e f", 0)
    assert got[2] == ("x y q", 3)
    assert got[3] == ("", 6)
    assert got[4] == ("p q r", 0)
    assert got[5] == ("p q", 0)
    assert got[6] == ("", 0)


def test_matches_duckdb_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW docs AS SELECT * FROM docs_pd")
    a = (
        remove_duplicate_spans(df, "doc_id", "text", 3)
        .select("doc_id", "n_removed_tokens", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        con.execute(oracle_remove_duplicate_spans_sql("docs", "doc_id", "text", 3))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_oracle_parity_on_real_corpus(spark, sf_dir):
    """Duplicated-docs base over the real documents table (the contract
    query's exact construction) at test scale."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", "text").unionAll(
        docs.where(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" the end marker")).alias("text"),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW base AS SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text || ' the end marker' "
        "FROM documents WHERE doc_id % 5 = 0"
    )
    a = (
        remove_duplicate_spans(base, "doc_id", "text", 20)
        .select("doc_id", "n_removed_tokens", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        con.execute(oracle_remove_duplicate_spans_sql("base", "doc_id", "text", 20))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the +100000 copies actually lost their duplicated prefix spans
    assert (a[a.doc_id >= 100000].n_removed_tokens > 0).any()


def test_no_rowwise_python_and_partial_agg(spark):
    """Plan shape: no Python UDF anywhere (pure JVM expressions) and the
    keeper selection is an aggregate (partial/map-side), not a window."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = remove_duplicate_spans(df, "doc_id", "text", 3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan
