"""Benchmark decontamination: n-gram overlap evidence + filtering."""

from pyspark.sql import functions as F

from paradump_spark.operators.decontam import contamination, decontaminate


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark partitions"),
            (3, "quick brown fox jumps again and again today"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps high"), (101, "short doc")],
        "doc_id long, text string",
    )


def test_contamination_counts_distinct_shared_shingles(spark):
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination(_docs(spark), _bench(spark)).collect()
    }
    # doc 1 shares 3-gram shingles "the quick brown", "quick brown fox",
    # "brown fox jumps" with bench 100; doc 3 shares the latter two;
    # doc 4 (< 3 tokens -> one whole-doc shingle) matches bench 101 exactly.
    assert got == {1: 3, 3: 2, 4: 1}


def test_decontaminate_drops_flagged_and_keeps_clean(spark):
    kept = decontaminate(_docs(spark), _bench(spark))
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # threshold: allow up to 2 shared shingles -> doc 3 (2 hits) and
    # doc 4 (1 hit) survive; doc 1 (3 hits) stays flagged
    kept2 = decontaminate(_docs(spark), _bench(spark), max_hits=2)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 3, 4]


def test_decontaminate_no_overlap_keeps_everything(spark):
    bench = _bench(spark).where(F.lit(False))
    assert decontaminate(_docs(spark), bench).count() == 4


def test_contamination_plan_is_broadcast_no_corpus_shuffle(spark):
    out = contamination(_docs(spark), _bench(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cli_decontam_runs_and_validates(spark, sf_dir, tmp_path, capsys):
    from paradump_spark.cli import main

    import pytest

    with pytest.raises(SystemExit):
        main(["decontam", "--directory", sf_dir, "--bench-directory", sf_dir,
              "--output", str(tmp_path / "x"), "--ngram", "0"])
    with pytest.raises(SystemExit):
        main(["decontam", "--directory", sf_dir, "--bench-directory", sf_dir,
              "--output", str(tmp_path / "x"), "--max-hits", "-1"])

    # corpus vs itself as the benchmark: everything is contaminated
    out = str(tmp_path / "clean")
    rc = main([
        "decontam", "--directory", sf_dir, "--bench-directory", sf_dir,
        "--output", out,
    ])
    assert rc == 0
    assert spark.read.parquet(out).count() == 0
    assert "kept 0 of" in capsys.readouterr().out


def test_contamination_broadcast_gate_degrades_to_shuffle(spark):
    """broadcast_bench=False must not force the broadcast: the bench side
    joins without a broadcast hint so an oversized benchmark degrades to
    a shuffle join instead of OOMing the driver."""
    out = contamination(_docs(spark), _bench(spark), broadcast_bench=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no explicit broadcast hint: with AQE on tiny data Spark may still
    # CHOOSE broadcast, so assert on the analyzed plan's hints instead
    logical = out._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical and "broadcast" not in logical.lower()
    # result identical either way
    a = {(r["doc_id"], r["n_hits"]) for r in out.collect()}
    b = {(r["doc_id"], r["n_hits"]) for r in contamination(_docs(spark), _bench(spark)).collect()}
    assert a == b


def test_cli_decontam_single_shingle_pass(spark, sf_dir, tmp_path, capsys, monkeypatch):
    """The CLI derives report + filter + write from ONE contamination()
    computation (the round-3 version ran the shingle join twice)."""
    import paradump_spark.operators.decontam as D
    from paradump_spark.cli import main

    calls = {"n": 0}
    orig = D.contamination

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(D, "contamination", counting)
    out = str(tmp_path / "clean2")
    rc = main([
        "decontam", "--directory", sf_dir, "--bench-directory", sf_dir,
        "--output", out, "--max-hits", "1000000",
    ])
    assert rc == 0
    assert calls["n"] == 1
    assert "flagged 0" in capsys.readouterr().out
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert spark.read.parquet(out).count() == docs
