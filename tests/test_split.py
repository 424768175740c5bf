"""Chunk-planner invariants — the reference enforces these via count
conservation in its e2e suite (/root/reference/test/run_test.sh:110-129):
the union of chunk predicates must cover the table exactly once."""

import pytest
from pyspark.sql import functions as F

from paradump_spark.plans.split import (
    Chunk,
    chunk_filter,
    chunk_predicates_sql,
    composite_range_sql,
    equality_sql,
    plan_chunks,
)


def _coverage(df, pk, chunks):
    return sum(df.where(chunk_filter(c, pk, df.schema)).count() for c in chunks)


def _pairwise_disjoint(df, pk, chunks):
    """Each row matched by exactly one chunk."""
    inds = [F.when(chunk_filter(c, pk, df.schema), 1).otherwise(0) for c in chunks]
    total = inds[0]
    for i in inds[1:]:
        total = total + i
    return df.where(total != 1).count() == 0


@pytest.mark.parametrize(
    "table,pk,n",
    [
        ("orders", ["o_orderkey"], 8),
        ("lineitem", ["l_orderkey", "l_linenumber"], 6),
        ("customer", ["c_name"], 5),  # string PK
        ("supplier", ["s_suppkey"], 64),  # more chunks than rows
    ],
)
def test_chunks_partition_table(spark, sf_dir, table, pk, n):
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    chunks = plan_chunks(df, pk, n)
    assert _coverage(df, pk, chunks) == df.count()
    assert _pairwise_disjoint(df, pk, chunks)


def test_sql_predicates_partition_table(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    chunks = plan_chunks(df, ["o_orderkey"], 8)
    preds = chunk_predicates_sql(chunks, ["o_orderkey"])
    df.createOrReplaceTempView("t_orders")
    total = sum(
        spark.sql(f"SELECT count(*) c FROM t_orders WHERE {p}").first()["c"]
        for p in preds
    )
    assert total == df.count()


def test_sql_predicates_string_pk(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    chunks = plan_chunks(df, ["c_name"], 6)
    preds = chunk_predicates_sql(chunks, ["c_name"])
    df.createOrReplaceTempView("t_cust")
    total = sum(
        spark.sql(f"SELECT count(*) c FROM t_cust WHERE {p}").first()["c"]
        for p in preds
    )
    assert total == df.count()


def test_integer_bounds_render_as_integers():
    sql = composite_range_sql(["k"], (380,), (760,))
    assert "380.0" not in sql and "380" in sql


def test_null_bound_raises():
    with pytest.raises(ValueError):
        composite_range_sql(["a", "b"], (1, None), None)


def test_equality_sql():
    assert equality_sql(["a", "b"], (1, "x'y")) == "(a = 1) AND (b = 'x''y')"


def test_single_chunk_is_unbounded():
    [c] = plan_chunks_single()
    assert c.begin is None and c.end is None


def plan_chunks_single():
    # num_chunks=1 must not touch the DataFrame at all
    class Boom:
        def __getattr__(self, name):
            raise AssertionError("should not be called")

    return plan_chunks(Boom(), ["k"], 1)


def test_empty_table(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").where(F.lit(False))
    chunks = plan_chunks(df, ["o_orderkey"], 8)
    assert len(chunks) == 1


def test_equality_chunk_flag():
    c = Chunk(0, (5,), (5,))
    assert c.begin_equal_end
    assert equality_sql(["k"], c.begin) == "(k = 5)"
