"""Property-based tests (hypothesis): chunking invariants over arbitrary
key sets, SQL-text vs Column predicate equivalence, escaper round-trips."""

import csv
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from paradump_spark.functions.render import csv_cell, mysql_escape
from paradump_spark.plans.split import (
    chunk_filter,
    chunk_predicates_sql,
    plan_chunks,
)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@_slow
@given(
    keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=300),
    n=st.integers(min_value=2, max_value=12),
)
def test_chunks_partition_any_int_keyset(spark, keys, n):
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    chunks = plan_chunks(df, ["k"], n, sample_rows=100)
    total = df.count()
    covered = sum(df.where(chunk_filter(c, ["k"], df.schema)).count() for c in chunks)
    assert covered == total  # covering + disjoint (duplicates included once)


@_slow
@given(
    keys=st.lists(
        st.tuples(st.integers(0, 50), st.text(alphabet="ab'x", min_size=0, max_size=4)),
        min_size=1,
        max_size=120,
    ),
    n=st.integers(min_value=2, max_value=6),
)
def test_sql_text_equals_column_path_composite(spark, keys, n):
    """The rendered predicate text selects exactly the same rows as the
    struct-comparison Column for composite (int, string) keys, including
    quotes inside string keys."""
    df = spark.createDataFrame(keys, "a int, b string")
    chunks = plan_chunks(df, ["a", "b"], n, sample_rows=50)
    df.createOrReplaceTempView("prop_t")
    preds = chunk_predicates_sql(chunks, ["a", "b"])
    for c, p in zip(chunks, preds):
        via_col = df.where(chunk_filter(c, ["a", "b"], df.schema)).count()
        via_sql = spark.sql(f"SELECT count(*) c FROM prop_t WHERE {p}").first()["c"]
        assert via_col == via_sql


_MYSQL_UNESCAPE = {
    "\\\\": "\\", "\\0": "\x00", "\\n": "\n", "\\r": "\r",
    "\\Z": "\x1a", "\\'": "'", '\\"': '"',
}


def _mysql_unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        pair = s[i : i + 2]
        if pair in _MYSQL_UNESCAPE:
            out.append(_MYSQL_UNESCAPE[pair])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


@_slow
@given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=40))
def test_mysql_escape_roundtrip(spark, s):
    df = spark.createDataFrame([(s,)], "v string")
    [row] = df.select(mysql_escape(F.col("v")).alias("e")).collect()
    assert _mysql_unescape(row["e"]) == s


@_slow
@given(st.text(alphabet=st.characters(max_codepoint=0xFF, exclude_characters="\x00"), max_size=30))
def test_csv_cell_roundtrip(spark, s):
    """A rendered CSV cell parses back to the original via the csv module
    (quote-if-needed + doubled-quote escaping)."""
    df = spark.createDataFrame([(s,)], "v string")
    [row] = df.select(csv_cell(F.col("v")).alias("c")).collect()
    # cells containing delimiter/quote/newlines come back quoted, so the
    # csv module parses them back verbatim
    if row["c"]:
        [parsed] = next(csv.reader(io.StringIO(row["c"]), strict=True))
    else:
        parsed = ""
    assert parsed == s
