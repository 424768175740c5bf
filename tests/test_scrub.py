"""CLI scrub subcommand + streaming document scrub: stream == batch, one
corpus scan, flag validation."""

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from paradump_spark.cli import main as cli_main
from paradump_spark.operators.pii import redact
from paradump_spark.operators.quality_rules import GopherThresholds, gopher_keep
from paradump_spark.streaming import (
    pii_monitor_stream,
    read_document_stream,
    scrub_document_stream,
)

# the synthetic corpus has only one Gopher stopword ('the'), so relax
# that rule to make the filter discriminate without dropping everything
TH = GopherThresholds(min_words=40, max_words=100_000, min_stopword_hits=1)


@pytest.fixture()
def docs_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", d / "part-000.parquet")
    return str(d)


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_scrub_matches_batch(spark, sf_dir, docs_dir):
    stream = read_document_stream(spark, docs_dir)
    name = f"scrub_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(scrub_document_stream(stream, "text", TH), name)
    got = {
        r["doc_id"]: r["text"]
        for r in spark.sql(f"SELECT doc_id, text FROM {name}").collect()
    }
    q.stop()
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exp = {
        r["doc_id"]: r["text"]
        for r in batch.where(gopher_keep("text", TH))
        .withColumn("text", redact("text"))
        .select("doc_id", "text")
        .collect()
    }
    assert got == exp
    assert 0 < len(got) < batch.count()  # the filter actually dropped docs


def test_stream_pii_monitor(spark, docs_dir):
    stream = read_document_stream(spark, docs_dir)
    name = f"pii_{uuid.uuid4().hex[:8]}"
    q = _run_to_memory(pii_monitor_stream(stream), name)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    q.stop()
    assert rows and all(r["n_pii"] == 0 for r in rows)  # synthetic corpus is clean


def test_stream_incremental_dedup_across_runs(spark, sf_dir, tmp_path):
    """Two availableNow runs over a growing shard directory: history in
    the signature store is never re-shingled, duplicates of BOTH the
    initial corpus and earlier-streamed shards are dropped, fresh docs'
    bands land in the store for the next run."""
    from paradump_spark.operators.dedup import write_signature_store
    from paradump_spark.streaming import (
        read_document_stream,
        stream_incremental_dedup,
    )

    # crafted corpus with per-doc unique vocabulary: banded-LSH candidate
    # matches (no Jaccard verify in the store probe) then occur ONLY for
    # genuine copies, keeping the expected sets deterministic
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(12))) for i in range(350)],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "sigstore")
    out = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    shards = tmp_path / "shards"
    shards.mkdir()

    write_signature_store(docs.where("doc_id < 200"), store, "doc_id", "text")

    # shard 1: 100 new docs + 20 exact copies of historical docs
    shard1 = docs.where("doc_id >= 200 AND doc_id < 300").unionAll(
        docs.where("doc_id < 20").select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    shard1.coalesce(1).write.parquet(str(shards / "s1"))

    def _run():
        q = stream_incremental_dedup(
            read_document_stream(spark, str(shards) + "/*"),
            store, out, ckpt,
        )
        q.awaitTermination(120)
        q.stop()

    _run()
    got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == set(range(200, 300))  # history copies dropped

    # shard 2: 50 new docs + copies of shard-1 docs (dup vs STREAMED data)
    shard2 = docs.where("doc_id >= 300 AND doc_id < 350").unionAll(
        docs.where("doc_id >= 200 AND doc_id < 220").select(
            (F.col("doc_id") + 600000).alias("doc_id"), "text"
        )
    )
    shard2.coalesce(1).write.parquet(str(shards / "s2"))
    _run()
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == set(range(200, 350))


def test_cli_scrub_end_to_end(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "scrubbed")
    rc = cli_main(
        [
            "scrub",
            "--directory", sf_dir,
            "--table", "documents",
            "--output", out,
            "--min-words", "40",
            "--min-stopword-hits", "1",
        ]
    )
    assert rc == 0
    msg = capsys.readouterr().out
    assert "scrub documents: kept" in msg
    got = spark.read.parquet(out)
    exp = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(gopher_keep("text", TH))
        .withColumn("text", redact("text"))
    )
    assert 0 < got.count() < 500
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert sorted(got.columns) == sorted(exp.columns)


def test_cli_scrub_flag_validation(tmp_path):
    with pytest.raises(SystemExit):
        cli_main(
            [
                "scrub", "--directory", "/x", "--output", str(tmp_path / "o"),
                "--no-redact", "--no-filter",
            ]
        )
    with pytest.raises(SystemExit):
        cli_main(
            [
                "scrub", "--directory", "/x", "--output", str(tmp_path / "o"),
                "--min-words", "10", "--max-words", "5",
            ]
        )


def test_cli_dedup_methods(spark, sf_dir, tmp_path, capsys):
    for method in ("exact", "minhash", "spans"):
        out = str(tmp_path / f"dedup_{method}")
        rc = cli_main(
            [
                "dedup", "--directory", sf_dir, "--output", out,
                "--method", method,
            ]
        )
        assert rc == 0
        assert f"dedup documents method={method}" in capsys.readouterr().out
        got = spark.read.parquet(out)
        if method == "exact":
            assert got.count() == 500  # texts are distinct: nothing dropped
        else:
            # the word-salad corpus contains genuine near-dups at J>=0.8,
            # so minhash may drop a few; spans keeps every row (it cuts
            # text, not documents)
            assert 400 < got.count() <= 500
        if method == "spans":
            assert "n_removed_tokens" in got.columns


def test_cli_dedup_drops_real_duplicates(spark, sf_dir, tmp_path):
    """Duplicate the corpus into a staging dir and confirm exact dedup
    halves it through the CLI."""
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = str(tmp_path / "staged")
    src.unionAll(src).write.parquet(f"{staged}/documents.parquet")
    out = str(tmp_path / "deduped")
    rc = cli_main(
        ["dedup", "--directory", staged, "--output", out, "--method", "exact"]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == 500


def test_cli_dedup_flag_validation(tmp_path):
    with pytest.raises(SystemExit):
        cli_main(
            ["dedup", "--directory", "/x", "--output", str(tmp_path / "o"),
             "--threshold", "1.5"]
        )
    with pytest.raises(SystemExit):
        cli_main(
            ["dedup", "--directory", "/x", "--output", str(tmp_path / "o"),
             "--span-tokens", "1"]
        )


def test_cli_scrub_single_corpus_scan(spark, sf_dir, tmp_path, monkeypatch):
    """The scrub write must scan the corpus exactly once — the report
    counts come from parquet footers, not extra data passes."""
    import pyspark.sql.classic.dataframe as cd

    reads = {"n": 0}
    orig = cd.DataFrame.where

    def counting_where(self, *a, **k):
        reads["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(cd.DataFrame, "where", counting_where)
    out = str(tmp_path / "one_scan")
    rc = cli_main(
        ["scrub", "--directory", sf_dir, "--output", out, "--min-words", "5"]
    )
    assert rc == 0
    assert reads["n"] == 1  # one filter application → one scrub pipeline


def test_cli_pipeline_end_to_end(spark, sf_dir, tmp_path, capsys):
    """scrub -> span-dedup -> decontam in one command, staged outputs."""
    import os

    root = str(tmp_path / "pipe")
    rc = cli_main(
        [
            "pipeline", "--directory", sf_dir, "--output-root", root,
            "--min-words", "40", "--min-stopword-hits", "1",
            "--dedup-method", "spans",
            "--bench-directory", sf_dir,  # corpus vs itself: all flagged
        ]
    )
    assert rc == 0
    msg = capsys.readouterr().out
    assert "pipeline documents: 500 input docs" in msg
    assert "scrub: kept" in msg and "dedup_spans: kept" in msg
    assert "decontam: kept" in msg
    stages = sorted(os.listdir(root))
    assert stages == ["01_scrub", "02_dedup_spans", "03_decontam"]
    n_scrub = spark.read.parquet(os.path.join(root, "01_scrub")).count()
    assert 0 < n_scrub < 500
    # bench == the original table, so every doc whose text SURVIVED the
    # earlier stages unchanged is flagged; only span-rewritten docs (cut
    # seams produce novel shingles) can pass — a small remainder
    n_final = spark.read.parquet(os.path.join(root, "03_decontam")).count()
    assert n_final < n_scrub / 2
    assert f"final stage holds {n_final} docs" in msg


def test_cli_pipeline_minimal(spark, sf_dir, tmp_path, capsys):
    root = str(tmp_path / "pipe2")
    rc = cli_main(
        [
            "pipeline", "--directory", sf_dir, "--output-root", root,
            "--skip-scrub", "--dedup-method", "exact",
        ]
    )
    assert rc == 0
    import os
    assert os.listdir(root) == ["01_dedup_exact"]
    assert spark.read.parquet(os.path.join(root, "01_dedup_exact")).count() == 500


def test_cli_optimize_compact_and_zorder(spark, sf_dir, tmp_path, capsys):
    import glob as g

    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lake = str(tmp_path / "lake")
    src.repartition(24).write.parquet(lake)  # fragment it
    assert len(g.glob(f"{lake}/part-*.parquet")) == 24

    rc = cli_main(["optimize", "--path", lake, "--target-mb", "512"])
    assert rc == 0
    assert "compacted to 1 files" in capsys.readouterr().out
    assert len(g.glob(f"{lake}/part-*.parquet")) == 1
    assert spark.read.parquet(lake).count() == src.count()

    rc = cli_main(
        ["optimize", "--path", lake,
         "--zorder-by", "l_orderkey", "--zorder-by", "l_partkey"]
    )
    assert rc == 0
    assert "morton-clustered on l_orderkey,l_partkey" in capsys.readouterr().out
    back = spark.read.parquet(lake)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0

    rc = cli_main(
        ["optimize", "--path", lake, "--curve", "hilbert",
         "--zorder-by", "l_orderkey", "--zorder-by", "l_partkey"]
    )
    assert rc == 0
    assert "hilbert-clustered" in capsys.readouterr().out
    assert spark.read.parquet(lake).count() == src.count()

    with pytest.raises(SystemExit):
        cli_main(["optimize", "--path", lake, "--zorder-by", "l_orderkey"])
    with pytest.raises(SystemExit):
        cli_main(["optimize", "--path", lake, "--target-mb", "0"])


def test_cli_dump_manifest_and_verify(spark, sf_dir, tmp_path, capsys):
    """dump --manifest -> restore (parquet mode IS the restore) ->
    verify-dump passes; a tampered table fails with exit 1."""
    out = str(tmp_path / "dump")
    rc = cli_main(
        ["dump", "--directory", sf_dir, "--output", out, "--mode", "parquet",
         "--table", "nation", "--table", "region", "--manifest"]
    )
    assert rc == 0
    assert "manifest" in capsys.readouterr().out
    manifest = os.path.join(out, "_manifest.json")
    assert os.path.exists(manifest)

    rc = cli_main(["verify-dump", "--directory", out, "--manifest", manifest])
    msg = capsys.readouterr().out
    assert rc == 0 and msg.count(": OK") == 2

    # tamper: drop a row from region
    df = spark.read.parquet(os.path.join(out, "region"))
    df.where("r_regionkey <> 0").write.mode("overwrite").parquet(
        os.path.join(out, "region2")
    )
    import shutil as sh
    sh.rmtree(os.path.join(out, "region"))
    os.rename(os.path.join(out, "region2"), os.path.join(out, "region"))
    rc = cli_main(["verify-dump", "--directory", out, "--manifest", manifest])
    msg = capsys.readouterr().out
    assert rc == 1 and "region: MISMATCH" in msg and "nation: OK" in msg


def test_cli_pipeline_chunk_and_pack_stages(spark, sf_dir, tmp_path, capsys):
    """pipeline with chunk + pack stages: staged outputs appear in order
    and the pack stage bins the CHUNK rows (unique chunk key)."""
    import glob
    import os

    from paradump_spark.cli import main

    root = str(tmp_path / "pl")
    rc = main(
        [
            "pipeline",
            "--directory", sf_dir,
            "--output-root", root,
            "--skip-scrub",
            "--dedup-method", "none",
            "--chunk-window", "32",
            "--chunk-stride", "24",
            "--pack-tokens", "128",
        ]
    )
    assert rc == 0
    stages = sorted(os.path.basename(p) for p in glob.glob(root + "/*"))
    assert stages == ["01_chunk", "02_pack"]
    chunks = spark.read.parquet(root + "/01_chunk")
    packed = spark.read.parquet(root + "/02_pack")
    assert packed.count() == chunks.count()  # every chunk got a bin
    from pyspark.sql import functions as F

    # no bin exceeds the budget (oversize singletons impossible: 32<128)
    over = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_chunk_tokens").alias("t"))
        .where(F.col("t") > 128)
        .count()
    )
    assert over == 0
    assert "chunk_uid" in packed.columns
    # pack key is collision-free (string doc_id#chunk_idx; ADVICE r05)
    assert packed.select("chunk_uid").distinct().count() == packed.count()


def test_cli_pipeline_stage_flag_validation(tmp_path):
    import pytest as _pytest

    from paradump_spark.cli import main

    base = [
        "pipeline", "--directory", "/nonexistent",
        "--output-root", str(tmp_path / "x"),
    ]
    with _pytest.raises(SystemExit):
        main(base + ["--chunk-window", "0"])
    with _pytest.raises(SystemExit):
        main(base + ["--chunk-stride", "4"])  # stride without window
    with _pytest.raises(SystemExit):
        main(base + ["--pack-tokens", "0"])


def test_stream_semantic_dedup_across_runs(spark, tmp_path):
    """Embedding twin of the minhash streaming store: two availableNow
    runs over a growing shard directory — near-dups of BOTH the initial
    store and earlier-streamed shards drop, survivors' keepers land for
    the next run, history is never re-clustered."""
    from paradump_spark.operators.semdedup import incremental_semantic_dedup
    from paradump_spark.streaming.documents import stream_semantic_dedup

    def vec(d, jit):
        v = [0.0] * 16
        v[d] = 1.0
        v[(d + 1) % 16] = 0.0005 * jit
        return v

    store = str(tmp_path / "semstore")
    out = str(tmp_path / "fresh")
    ckpt = str(tmp_path / "ckpt")
    shards = tmp_path / "shards"
    shards.mkdir()

    # init: ball A (ids 0-9 -> keeper 0) + two distinct directions
    init = spark.createDataFrame(
        [(i, vec(0, 0)) for i in range(10)]
        + [(50, vec(4, 0)), (51, vec(8, 0))],
        "vid long, v array<float>",
    )
    f0, _ = incremental_semantic_dedup(
        spark, store, init, "vid", "v", threshold=0.95, num_clusters=4
    )
    assert {r.vid for r in f0.collect()} == {0, 50, 51}

    # shard 1: new ball B + more members of historical ball A
    spark.createDataFrame(
        [(100 + i, vec(12, 0)) for i in range(8)]
        + [(200 + i, vec(0, 0)) for i in range(5)],
        "vid long, v array<float>",
    ).coalesce(1).write.parquet(str(shards / "s1"))

    def _run():
        stream = (
            spark.readStream.schema("vid long, v array<float>")
            .parquet(str(shards) + "/*")
        )
        q = stream_semantic_dedup(
            stream, store, out, ckpt, id_col="vid", vec_col="v",
            threshold=0.95, num_clusters=4,
        )
        q.awaitTermination(120)
        q.stop()

    _run()
    got1 = {r.vid for r in spark.read.parquet(out).collect()}
    assert got1 == {100}  # ball B keeper kept; ball-A copies dropped

    # shard 2: copies of STREAMED ball B + one brand-new direction
    spark.createDataFrame(
        [(300 + i, vec(12, 0)) for i in range(5)] + [(400, vec(2, 0))],
        "vid long, v array<float>",
    ).coalesce(1).write.parquet(str(shards / "s2"))
    _run()
    got2 = {r.vid for r in spark.read.parquet(out).collect()}
    assert got2 == {100, 400}  # dup-vs-streamed dropped, new kept
