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


def sample_frames(
    binary_df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plumbing: each media row fans out to ``n_frames``
    rows of (frame_idx, timestamp, frame bytes) — the 1→N Arrow-batch
    shape a real video decoder fills in.  The decode itself is stubbed
    with a deterministic fake (md5-keyed bytes, evenly spaced timestamps
    over ``media_meta.duration_ms``) so tests pin schema, cardinality,
    and determinism without codecs."""
    if n_frames <= 0:
        raise ValueError(f"n_frames must be positive, got {n_frames}")
    # keep the caller's id column name AND type (string/long/... ids all work)
    out_schema = T.StructType(
        [
            T.StructField(id_col, binary_df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload, dur in zip(
                pdf[id_col], pdf["payload"], pdf["duration_ms"]
            ):
                total = int(dur) if dur and dur > 0 else n_frames
                for k in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(k)
                    tss.append((k * total) // n_frames)
                    # deterministic fake "decoded frame": keyed digest bytes
                    frames.append(
                        hashlib.md5(bytes(payload) + k.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ms": pd.Series(tss, dtype="int64"),
                    "frame_payload": frames,
                }
            )

    src = binary_df.select(
        F.col(id_col),
        F.col("payload"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )
    return src.mapInPandas(batches, out_schema)


def resize_stub(
    binary_df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing: payload → payload' with updated metadata dims.
    The pixel work is a stub (deterministic digest bytes sized to the
    target) — swap the inner function for PIL in production; the Spark
    side (schema preservation, Arrow batching, metadata rewrite) is real."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        fake_len = max(16, (width * height) // 64)  # stand-in byte budget
        for pdf in it:
            resized = [
                (hashlib.md5(bytes(b)).digest() * (fake_len // 16 + 1))[:fake_len]
                for b in pdf["payload"]
            ]
            metas = [
                {
                    "media_type": m["media_type"],
                    "codec": m["codec"],
                    "width": width,
                    "height": height,
                    "duration_ms": m["duration_ms"],
                }
                for m in pdf["media_meta"]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "payload": resized, "media_meta": metas}
            )

    return binary_df.mapInPandas(batches, out_schema)


def read_media_dir(
    spark,
    path: str,
    media_type: str = "image",
    glob: str | None = None,
) -> DataFrame:
    """Real multimodal ingest: ``binaryFile`` source over a directory →
    the same (doc_id, payload, media_meta) shape :func:`extract_features`
    / :func:`sample_frames` consume.

    ``binaryFile`` streams each file's bytes as one row (path, length,
    modificationTime, content) — distributed, no driver involvement;
    ``doc_id`` is the path's 60-bit md5 (stable across re-ingests).
    Dimension/duration metadata stays NULL until a real decoder fills it.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        F.col("path"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )
