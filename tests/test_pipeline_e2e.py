"""End-to-end training-data pipeline: the operators compose.

documents → quality filter → exact+near dedup → deterministic split →
FFD packing → parquet dump + checksum manifest → verified restore.
Each stage is lazy; the whole pipeline is one DAG until the writes.
"""

from pyspark.sql import functions as F

from paradump_spark.catalog import ParquetCatalog
from paradump_spark.functions.text import token_count
from paradump_spark.operators.dedup import dedup_exact, dedup_minhash
from paradump_spark.operators.packing import pack_documents, packing_stats
from paradump_spark.operators.sampling import split
from paradump_spark.operators.text_analysis import quality_filter


def test_full_training_data_pipeline(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (pure scan predicates)
    good = quality_filter(docs, "text", min_tokens=3, min_alpha_ratio=0.3)
    n1 = good.count()
    assert 0 < n1 <= n0

    # 2. exact then near dedup
    uniq = dedup_exact(good, ["text"], "doc_id")
    deduped = dedup_minhash(uniq, "doc_id", "text", threshold=0.9)
    n2 = deduped.count()
    assert 0 < n2 <= n1

    # 3. reproducible train/val/test split
    parts = split(deduped, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n_train = parts["train"].count()
    assert sum(p.count() for p in parts.values()) == n2

    # 4. pack the train split into 512-token bins
    train = parts["train"].select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    packed = pack_documents(train, "doc_id", "n_tokens", 512, partitions=4)
    stats = packing_stats(packed, "n_tokens", 512).collect()[0]
    assert stats["n_docs"] == n_train

    # 5. dump the curated corpus + manifest, verify the restore
    from paradump_spark.dump import DumpResult, verify_dump, write_manifest

    outdir = str(tmp_path / "curated")
    deduped.write.parquet(f"{outdir}/documents.parquet")
    out_cat = ParquetCatalog(spark, outdir)
    mpath = write_manifest(
        out_cat, outdir, [DumpResult("documents", "parquet", outdir)]
    )
    assert verify_dump(out_cat, mpath) == {"documents": True}
