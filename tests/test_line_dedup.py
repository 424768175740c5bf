"""Cross-corpus line-level boilerplate removal (C4/RefinedWeb policy)."""

from pyspark.sql import functions as F

from paradump_spark.operators.dedup import (
    line_duplication_profile,
    remove_boilerplate_lines,
)

BANNER = "accept all cookies to continue"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"unique intro one\n{BANNER}\nreal content alpha"),
            (2, f"{BANNER}\nreal content beta\n\ntrailing para"),
            (3, f"another opener\n{BANNER}"),
            (4, "no boilerplate here at all"),
            (5, f"{BANNER}"),  # nothing but the banner
        ],
        "doc_id long, text string",
    )


def test_profile_counts_docs_and_occurrences(spark):
    prof = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in line_duplication_profile(_docs(spark), "doc_id", "text").collect()
    }
    assert prof[BANNER] == (4, 4)
    assert prof["real content alpha"] == (1, 1)
    # blank lines are never profiled
    assert "" not in prof


def test_banner_removed_everywhere(spark):
    out = {
        r["doc_id"]: (r["text"], r["n_removed_lines"])
        for r in remove_boilerplate_lines(
            _docs(spark), "doc_id", "text", max_docs=1
        ).collect()
    }
    assert out[1] == ("unique intro one\nreal content alpha", 1)
    # blank line survives (structure, not content)
    assert out[2] == ("real content beta\n\ntrailing para", 1)
    assert out[3] == ("another opener", 1)
    assert out[4] == ("no boilerplate here at all", 0)
    assert out[5] == ("", 1)  # banner-only doc becomes empty, stays present


def test_threshold_spares_low_fanout(spark):
    # max_docs=4: the banner (4 docs) is NOT above threshold
    out = remove_boilerplate_lines(_docs(spark), "doc_id", "text", max_docs=4)
    assert out.agg(F.sum("n_removed_lines")).collect()[0][0] == 0


def test_out_col_keeps_original(spark):
    out = remove_boilerplate_lines(
        _docs(spark), "doc_id", "text", max_docs=1, out_col="clean"
    )
    row = out.where(F.col("doc_id") == 1).collect()[0]
    assert BANNER in row["text"] and BANNER not in row["clean"]


def test_broadcast_and_fallback_agree(spark):
    a = {
        (r["doc_id"], r["text"])
        for r in remove_boilerplate_lines(
            _docs(spark), "doc_id", "text", broadcast_dups=True
        ).collect()
    }
    b = {
        (r["doc_id"], r["text"])
        for r in remove_boilerplate_lines(
            _docs(spark), "doc_id", "text", broadcast_dups=False
        ).collect()
    }
    assert a == b


def test_no_python_in_plan(spark):
    out = remove_boilerplate_lines(_docs(spark), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_text_document_survives(spark):
    """NULL-text documents produce no exploded lines; the left-join
    rebuild must keep them in the corpus (ADVICE r04)."""
    docs = _docs(spark).union(
        spark.createDataFrame([(6, None)], "doc_id long, text string")
    )
    out = remove_boilerplate_lines(docs, "doc_id", "text", max_docs=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    assert rows[6]["text"] is None
    assert rows[6]["n_removed_lines"] == 0
