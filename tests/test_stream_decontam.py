"""Streaming benchmark decontamination
(streaming/documents.py:decontam_stream): stream == batch equality on
both the exact-broadcast and Bloom paths, benchmark-side work paid
once, multi-shard append."""

import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.decontam import decontaminate
from paradump_spark.streaming.documents import decontam_stream


@pytest.fixture()
def corpus_and_bench(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    return docs, bench


def _stream_dir(spark, sf_dir, tmp_path, n_shards=2):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = tmp_path / "docs_stream"
    d.mkdir()
    for i in range(n_shards):
        docs.where(F.col("doc_id") % n_shards == i).write.parquet(
            str(d / f"shard{i}.parquet")
        )
    return str(d)


def _read_doc_stream(spark, path):
    docs_schema = spark.read.parquet(path + "/shard0.parquet").schema
    return (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/*")
    )


@pytest.mark.parametrize("n_bits", [0, 1 << 20])
def test_stream_equals_batch(spark, sf_dir, tmp_path, corpus_and_bench, n_bits):
    docs, bench = corpus_and_bench
    src = _stream_dir(spark, sf_dir, tmp_path)
    out = str(tmp_path / f"clean_{n_bits}")
    q = decontam_stream(
        _read_doc_stream(spark, src),
        bench,
        out,
        checkpoint_dir=str(tmp_path / f"ckpt_{n_bits}"),
        n_bits=n_bits,
    )
    q.awaitTermination(180)
    q.stop()
    got = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in decontaminate(docs, bench).select("doc_id").collect()
    }
    assert got == want
    assert got  # something survives
    # every benchmark member is itself contaminated, hence absent
    assert not {
        r["doc_id"] for r in bench.select("doc_id").collect()
    } & got


def test_chunking_runs_on_stream_unchanged(spark, sf_dir, tmp_path):
    """chunk_documents is a stateless projection+generator, so the SAME
    operator code runs on a readStream source; output equals batch."""
    from paradump_spark.operators.packing import chunk_documents

    src = _stream_dir(spark, sf_dir, tmp_path)
    stream = _read_doc_stream(spark, src)
    out = str(tmp_path / "chunks_stream")
    q = (
        chunk_documents(stream, "doc_id", "text", window=64, stride=48)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(docs, "doc_id", "text", 64, 48).collect()
    }
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
