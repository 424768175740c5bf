"""CLI: media-dedup — the perceptual / robust near-dup dedup verb over
binary media parquet (image/audio/video), the user surface for
operators/multimodal.py's dedup family."""

import pytest
from pyspark.sql import functions as F

from paradump_spark.cli import main
from paradump_spark.operators import multimodal as MM


def _corpus_parquet(spark, tmp_path, kind: str, n: int = 60) -> str:
    ids = spark.range(n).selectExpr("id as doc_id")
    gen = {
        "image": MM.synthetic_image_corpus,
        "audio": MM.synthetic_audio_corpus,
        "video": MM.synthetic_video_corpus,
        "audio_robust": MM.synthetic_audio_corpus_robust,
        "video_robust": MM.synthetic_video_corpus_robust,
    }[kind]
    path = str(tmp_path / f"{kind}_corpus")
    gen(ids, "doc_id", groups=8).write.mode("overwrite").parquet(path)
    return path


def test_media_dedup_image_keeps_match_operator(spark, tmp_path, capsys):
    src = _corpus_parquet(spark, tmp_path, "image")
    out = str(tmp_path / "kept")
    rc = main([
        "media-dedup", "--input", src, "--modality", "image",
        "--output", out,
    ])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "media-dedup image" in msg and "kept" in msg
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    flags = MM.image_dedup_flags(spark.read.parquet(src), "doc_id")
    expect = {
        r["doc_id"]
        for r in flags.where(~flags.is_image_dup).select("doc_id").collect()
    }
    assert kept == expect
    assert len(kept) < 60  # the synthetic corpus plants dup families


def test_media_dedup_flags_mode_writes_every_row(spark, tmp_path):
    src = _corpus_parquet(spark, tmp_path, "audio")
    out = str(tmp_path / "flagged")
    rc = main([
        "media-dedup", "--input", src, "--modality", "audio",
        "--output", out, "--keep-flags",
    ])
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() == 60  # every input row, flag column attached
    assert "is_audio_dup" in back.columns
    assert back.where("is_audio_dup").count() > 0


def test_media_dedup_robust_video(spark, tmp_path, capsys):
    src = _corpus_parquet(spark, tmp_path, "video_robust")
    out = str(tmp_path / "kept")
    rc = main([
        "media-dedup", "--input", src, "--modality", "video", "--robust",
        "--output", out,
    ])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    flags = MM.video_robust_dedup_flags(spark.read.parquet(src), "doc_id")
    expect = {
        r["doc_id"]
        for r in flags.where(~flags.is_video_dup).select("doc_id").collect()
    }
    assert kept == expect


def test_media_dedup_validation(tmp_path):
    # robust image does not exist; unknown modality rejected by argparse
    with pytest.raises(SystemExit):
        main([
            "media-dedup", "--input", "/nonexistent", "--modality", "text",
            "--output", str(tmp_path / "x"),
        ])
    with pytest.raises(SystemExit):
        main([
            "media-dedup", "--input", "/nonexistent", "--modality", "image",
            "--robust", "--output", str(tmp_path / "x"),
        ])


def test_media_dedup_custom_id_and_payload_cols(spark, tmp_path):
    """ADVICE r10: a non-default --id-col/--payload-col must work even
    when the input ALSO carries decoy columns literally named doc_id /
    payload (the pipelines key on canonical names internally)."""
    src_canon = spark.read.parquet(_corpus_parquet(spark, tmp_path, "image"))
    src = (
        src_canon
        .withColumnRenamed("doc_id", "my_id")
        .withColumnRenamed("payload", "blob")
        .withColumn("doc_id", F.lit(-1).cast("long"))  # decoy
        .withColumn("payload", F.lit(b"decoy"))        # decoy
    )
    custom = str(tmp_path / "custom_src")
    src.write.mode("overwrite").parquet(custom)

    kept_out = str(tmp_path / "custom_kept")
    rc = main([
        "media-dedup", "--input", custom, "--modality", "image",
        "--id-col", "my_id", "--payload-col", "blob",
        "--output", kept_out,
    ])
    assert rc == 0
    kept_df = spark.read.parquet(kept_out)
    # kept mode preserves EVERY input column, including the decoys
    assert set(kept_df.columns) == set(src.columns)
    kept = {r["my_id"] for r in kept_df.select("my_id").collect()}
    flags = MM.image_dedup_flags(src_canon, "doc_id")
    expect = {
        r["doc_id"]
        for r in flags.where(~flags.is_image_dup).select("doc_id").collect()
    }
    assert kept == expect

    flags_out = str(tmp_path / "custom_flags")
    rc = main([
        "media-dedup", "--input", custom, "--modality", "image",
        "--id-col", "my_id", "--payload-col", "blob",
        "--output", flags_out, "--keep-flags",
    ])
    assert rc == 0
    back = spark.read.parquet(flags_out)
    # flags mode renames the canonical id back to the caller's name
    assert "my_id" in back.columns and "doc_id" not in back.columns
    assert back.count() == src_canon.count()
    assert back.where("is_image_dup").count() > 0
