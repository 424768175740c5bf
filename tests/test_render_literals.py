"""sql_literal rendering for binary / date / boolean / decimal cells."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from paradump_spark.functions.render import binary_literal, sql_literal


def _render(spark, value, spark_type, dialect="mysql"):
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("v", spark_type)]))
    return df.select(
        sql_literal(F.col("v"), None, dialect, spark_type).alias("r")
    ).first()["r"]


def test_binary_literals_per_dialect(spark):
    b = bytes([0xDE, 0xAD, 0x00, 0xBE])
    assert _render(spark, b, T.BinaryType(), "mysql") == "_binary X'dead00be'"
    assert _render(spark, b, T.BinaryType(), "postgres") == "decode('dead00be','hex')"
    assert (
        _render(spark, b, T.BinaryType(), "mssql")
        == "convert(varbinary(max),'dead00be',2)"
    )


def test_date_and_timestamp_literals(spark):
    assert _render(spark, datetime.date(2024, 2, 29), T.DateType()) == "'2024-02-29'"
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert _render(spark, ts, T.TimestampType()) == "'2024-01-02 03:04:05'"


def test_bool_and_null_literals(spark):
    assert _render(spark, True, T.BooleanType()) == "1"
    assert _render(spark, False, T.BooleanType()) == "0"
    assert _render(spark, None, T.StringType()) == "NULL"
    assert _render(spark, None, T.BinaryType()) == "NULL"


def test_decimal_literal(spark):
    import decimal

    assert (
        _render(spark, decimal.Decimal("12.50"), T.DecimalType(10, 2)) == "12.50"
    )


def test_string_literal_dialect_prefix(spark):
    assert _render(spark, "o'k", T.StringType(), "mysql") == r"'o\'k'"
    assert _render(spark, "o'k", T.StringType(), "postgres") == r"E'o\'k'"
    assert _render(spark, "o'k", T.StringType(), "mssql") == "N'o''k'"


def test_binary_literal_direct(spark):
    df = spark.createDataFrame([(b"\x01",)], "v binary")
    assert (
        df.select(binary_literal(F.col("v"), "mysql").alias("r")).first()["r"]
        == "_binary X'01'"
    )
