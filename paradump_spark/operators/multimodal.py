"""Multimodal column plumbing — opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

Beyond-reference surface.  Real pipelines carry image/audio/video bytes in
a ``binary`` column next to a metadata struct; decode/resize/frame-sample
run as pandas-batch functions so the bytes never round-trip per-row.  The
actual media codecs aren't in this container, so the decode step is a
clearly-marked stub (`decode_stub`) — everything Spark-side (schema,
partition shape, Arrow batch plumbing, deterministic fake features) is real
and tested.

Scale notes: ``mapInPandas`` streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory is
batch-sized, not partition-sized; payload bytes stay off the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried next to every binary payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video|text
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def decode_stub(payload: bytes) -> object:
    """Placeholder for the real media decode (PIL / libav / etc. are not in
    this container).  Raise loudly so nobody mistakes the stub for a codec."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; wire PIL/av here in production"
    )


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "text"
) -> DataFrame:
    """Model a multimodal table from a text table: payload = UTF-8 bytes,
    plus a typed metadata struct.  (Real ingest reads files into the same
    shape: ``spark.read.format('binaryFile')`` gives path/length/content.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("utf-8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def extract_features(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column:
    byte length + content hash (the deterministic stand-in for the decoded
    embedding).  Demonstrates the real batch shape a decoder plugs into."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return binary_df.select(F.col(id_col), F.col("payload")).mapInPandas(
        batches, FEATURE_SCHEMA
    )
