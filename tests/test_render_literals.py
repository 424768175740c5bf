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


# ---------------------------------------------------------------------------
# F2 — mysqldump-parity byte escaper with UTF-8 repair


def test_mysql_escape_bytes_basic_escapes():
    from paradump_spark.functions.render import mysql_escape_bytes as esc

    assert esc(b"hello") == b"hello"
    assert esc(b"a'b") == b"a\\'b"
    assert esc(b'\x00\n\r\x1a"\\') == b'\\0\\n\\r\\Z\\"\\\\'
    assert esc(None) is None
    assert esc(b"") == b""


def test_mysql_escape_bytes_valid_utf8_passthrough():
    from paradump_spark.functions.render import mysql_escape_bytes as esc

    for s in ("é", "北京", "🎉", "퟿"):  # 2/3/4-byte + U+D7FF (ED 9F BF)
        b = s.encode("utf-8")
        assert esc(b) == b, s


def test_mysql_escape_bytes_invalid_utf8_repair():
    from paradump_spark.functions.render import mysql_escape_bytes as esc

    # invalid continuation after a lead byte -> lead escaped, rest rescanned
    assert esc(b"\xc3(") == b"\\\xc3("
    # overlong encoding: C0 AF is never valid
    assert esc(b"\xc0\xaf") == b"\\\xc0\xaf"
    # truncated 3-byte sequence at end of value
    assert esc(b"abc\xe2\x82") == b"abc\\\xe2\x82"
    # stray continuation and 0xF8-0xFF bytes pass through verbatim
    assert esc(b"\x80\xf8\xff") == b"\x80\xf8\xff"
    # invalid lead 0xF5, and F4-led sequence beyond U+10FFFF
    assert esc(b"\xf5\x80\x80\x80") == b"\\\xf5\x80\x80\x80"
    assert esc(b"\xf4\x90\x80\x80") == b"\\\xf4\x90\x80\x80"


def test_mysql_escape_bytes_cesu8_surrogates_pass():
    from paradump_spark.functions.render import mysql_escape_bytes as esc

    # CESU-8 surrogate pair for U+1F4A9 (ED A0 BD ED B2 A9): MySQL utf8mb3
    # smuggling — passes through UNrepaired
    cesu = b"\xed\xa0\xbd\xed\xb2\xa9"
    assert esc(cesu) == cesu
    # ED lead with too few bytes left is NOT the surrogate case -> repaired
    assert esc(b"\xed\xa0") == b"\\\xed\xa0"


def test_mysql_dump_literal_udf_matches_python(spark):
    from paradump_spark.functions.render import (
        mysql_dump_literal_udf,
        mysql_escape_bytes,
    )

    payloads = [
        b"plain",
        b"it's\n\x00done\\",
        "café 北京 🎉".encode("utf-8"),
        b"\xc3(bad\xed\xa0\xbdcesu\xed\xb2\xa9\x80tail\xe2\x82",
        None,
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "v binary")
    udf = mysql_dump_literal_udf()
    got = [r["r"] for r in df.select(udf(F.col("v")).alias("r")).collect()]
    exp = [
        None if p is None else b"'" + mysql_escape_bytes(p) + b"'"
        for p in payloads
    ]
    assert sorted(x for x in got if x is not None) == sorted(
        x for x in exp if x is not None
    )
    assert got.count(None) == 1
