"""Enum-in-PK semantics (SURVEY §1.3): ordering by index, not label."""

from pyspark.sql import functions as F

from paradump_spark.plans.split import (
    chunk_filter,
    chunk_predicates_sql,
    enum_index,
    enum_pk_col_sql,
    plan_chunks,
)

# deliberately NOT in lexical order: index order c < a < b
ENUM_VALUES = ["charlie", "alpha", "bravo"]


def _enum_df(spark):
    rows = [
        (label, i)
        for i, label in enumerate(["charlie", "alpha", "bravo"] * 40)
    ]
    return spark.createDataFrame(rows, "status string, seq int")


def test_enum_index_values(spark):
    df = spark.createDataFrame(
        [("alpha",), ("bravo",), ("charlie",), ("bogus",), (None,)], "s string"
    )
    got = [r["i"] for r in df.select(enum_index("s", ENUM_VALUES).alias("i")).collect()]
    assert got == [2, 3, 1, 0, 0]  # 1-based; invalid/NULL -> 0 like MySQL


def test_enum_pk_chunking_orders_by_index(spark):
    df = _enum_df(spark).withColumn("__ord", enum_index("status", ENUM_VALUES))
    pk = ["__ord", "seq"]
    chunks = plan_chunks(df, pk, 4)
    covered = sum(df.where(chunk_filter(c, pk, df.schema)).count() for c in chunks)
    assert covered == df.count()


def test_enum_col_sql_rendering():
    col_sql = enum_pk_col_sql(["status", "seq"], ["status"])
    assert col_sql == {"status": "cast(`status` as unsigned integer)"}
    from paradump_spark.plans.split import Chunk

    [pred] = chunk_predicates_sql(
        [Chunk(0, (1, 5), (2, 3))], ["status", "seq"], quote="`", col_sql=col_sql
    )
    assert "cast(`status` as unsigned integer) >= 1" in pred or (
        "cast(`status` as unsigned integer) > 1" in pred
    )
    assert "`seq`" in pred
