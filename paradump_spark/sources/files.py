"""File sources — reading dump output back (the file analogue of the
reference's dst chunk reader, src/parasync/parasync.go:2626-2834, which
re-reads what a previous dump/copy produced so it can be diffed).

A dump → read-back → diff loop is the standard end-to-end consistency
check: ``write_csv`` + ``read_csv_dump`` round-trips bit-exactly under
the same convention (``\\N`` NULL, ``"``-quote/escape), so
``operators.diff.diff_classified(src, read_back, pk)`` counting zero DML
proves the dump complete.  Schema is explicit (from the source table or
``meta``) — dumps carry no header, and inference at 100 TB means an extra
full pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from paradump_spark.meta import TableMeta


def read_csv_dump(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    compression: str | None = None,
) -> DataFrame:
    """Read files produced by ``sinks.files.write_csv(exact=False)`` back
    into their original schema.  Distributed file-splittable scan; codecs
    are detected per-file by extension."""
    reader = (
        spark.read.schema(schema)
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .option("quote", '"')
        .option("escape", '"')
        .option("header", "false")
    )
    return reader.csv(path)


def schema_from_meta(meta: TableMeta) -> T.StructType:
    """The Spark schema a dump of ``meta``'s table round-trips through."""
    return T.StructType(
        [T.StructField(c.name, c.spark_type, c.nullable) for c in meta.columns]
    )
