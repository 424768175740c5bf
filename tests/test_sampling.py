"""Deterministic sampling/split operators: stability, disjointness, parity
with the DuckDB-reproducible hash spelling."""

import duckdb
from pyspark.sql import functions as F

from paradump_spark.operators import sampling as S


def test_split_is_partition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = S.split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {k: v.count() for k, v in parts.items()}
    assert sum(counts.values()) == n  # disjoint + covering
    ids = None
    for p in parts.values():
        cur = {r[0] for r in p.select("doc_id").collect()}
        assert ids is None or not (ids & cur)
        ids = (ids or set()) | cur
    # roughly proportional (hash uniformity; 500 docs -> loose bounds)
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]


def test_sample_fraction_stable_and_nested(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s20 = S.sample_fraction(docs, "doc_id", 0.2)
    s50 = S.sample_fraction(docs, "doc_id", 0.5)
    a = {r[0] for r in s20.select("doc_id").collect()}
    b = {r[0] for r in s20.select("doc_id").collect()}
    assert a == b  # rerun-stable
    big = {r[0] for r in s50.select("doc_id").collect()}
    assert a <= big  # fractions are nested prefixes of the bucket space


def test_hash_bucket_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["b"])
        for r in docs.select(
            "doc_id", S.hash_bucket(F.col("doc_id"), seed="s1").alias("b")
        ).collect()
    }
    exp = set(
        duckdb.sql(
            f"""SELECT doc_id,
                ('0x' || substr(md5('s1' || coalesce(CAST(doc_id AS VARCHAR),
                  chr(0) || 'NULL')), 1, 15))::BIGINT
                  % {S.DENOM} AS b
                FROM '{sf_dir}/documents.parquet'"""
        ).fetchall()
    )
    assert got == exp


def test_null_ids_route_consistently(spark):
    """NULL ids are neither dropped by sample_fraction nor routed
    differently by split_column — both hash the same sentinel bucket."""
    df = spark.createDataFrame(
        [("a",), ("b",), (None,)], "doc_id string"
    )
    kept = S.sample_fraction(df, "doc_id", 1.0).count()
    assert kept == 3  # fraction=1.0 keeps every row, NULL id included
    lab_full = S.split_column(
        F.col("doc_id"), {"train": 0.5, "test": 0.5}, seed="z"
    )
    full = {
        (r["doc_id"], r["s"])
        for r in df.select("doc_id", lab_full.alias("s")).collect()
    }
    null_split = {s for d, s in full if d is None}
    assert len(null_split) == 1  # deterministic single assignment
    # and the assignment is bucket-derived, matching sample_fraction's view
    b = df.where(F.col("doc_id").isNull()).select(
        S.hash_bucket(F.col("doc_id"), seed="z").alias("b")
    ).collect()[0]["b"]
    assert (b < 500_000) == (null_split == {"train"})


def test_mixture_and_weight_validation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"),
        F.lit("e").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("emb").alias("source"),
        F.lit(1).cast("long").alias("n_chars"),
    )
    mix = S.mixture([(docs, "doc_id", 0.5), (emb, "doc_id", 0.1)])
    n_docs = S.sample_fraction(docs, "doc_id", 0.5).count()
    n_emb = S.sample_fraction(emb, "doc_id", 0.1).count()
    assert mix.count() == n_docs + n_emb

    import pytest

    with pytest.raises(ValueError):
        S.split_column(F.col("doc_id"), {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        S.sample_fraction(docs, "doc_id", 1.5)


def test_stratified_sample_respects_strata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = S.stratified_sample(docs, "lang", {"en": 1.0}, seed=7)
    langs = {r[0] for r in out.select("lang").distinct().collect()}
    assert langs <= {"en"}
    assert out.count() == docs.where(F.col("lang") == "en").count()


def test_mixture_rejects_empty_sources():
    import pytest

    with pytest.raises(ValueError):
        S.mixture([])


def test_group_top_k_exact_size_and_determinism(spark, sf_dir):
    from paradump_spark.operators.sampling import group_top_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = group_top_k(docs, ["lang"], "doc_id", 5)
    s2 = group_top_k(docs, ["lang"], "doc_id", 5)
    r1 = sorted((r["lang"], r["doc_id"]) for r in s1.collect())
    assert r1 == sorted((r["lang"], r["doc_id"]) for r in s2.collect())
    from collections import Counter

    per_group = Counter(lang for lang, _ in r1)
    totals = Counter(r["lang"] for r in docs.select("lang").collect())
    for lang, n in per_group.items():
        assert n == min(5, totals[lang]), lang
    # a different seed picks a different (still deterministic) sample
    s3 = group_top_k(docs, ["lang"], "doc_id", 5, seed="other")
    assert r1 != sorted((r["lang"], r["doc_id"]) for r in s3.collect())


def test_group_top_k_partial_bounds_global_window_input(spark, sf_dir):
    """Skew-safety contract: the candidate set entering the global
    row_number window holds ≤ k rows per (input partition, group) —
    i.e. ≤ k × partitions per group — and is a superset of the final
    top-k, so the plan is identical-result but never funnels a whole
    hot group through one task."""
    from collections import Counter

    from paradump_spark.operators.sampling import group_top_k, group_top_k_partial

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    k = 5
    cand = group_top_k_partial(docs, ["lang"], "doc_id", k)
    n_parts = docs.rdd.getNumPartitions()
    per_group = Counter(r["lang"] for r in cand.select("lang").collect())
    for lang, n in per_group.items():
        assert n <= k * n_parts, (lang, n)
    cand_ids = {(r["lang"], r["doc_id"]) for r in cand.select("lang", "doc_id").collect()}
    final = {
        (r["lang"], r["doc_id"])
        for r in group_top_k(docs, ["lang"], "doc_id", k).select("lang", "doc_id").collect()
    }
    assert final <= cand_ids
    # the physical plan has exactly two Window nodes: the per-partition
    # partial cut and the bounded global ranking
    plan = group_top_k(docs, ["lang"], "doc_id", k)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2


def test_group_top_k_skewed_group_matches_naive(spark):
    """One pathological group (90% of rows) — two-stage result must equal
    the naive single-window definition."""
    from pyspark.sql import Window

    from paradump_spark.operators import sampling as S

    rows = [("hot", i) for i in range(900)] + [
        (f"g{i % 10}", 1000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, id long").repartition(16)
    got = {
        (r["grp"], r["id"])
        for r in S.group_top_k(df, ["grp"], "id", 7).collect()
    }
    w = Window.partitionBy("grp").orderBy(
        S.hash_bucket(F.col("id")).asc(), F.col("id").asc()
    )
    naive = {
        (r["grp"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 7)
        .collect()
    }
    assert got == naive


def test_mixture_plan_semantics(spark):
    import pytest

    from paradump_spark.operators.sampling import mixture_plan

    rows = [
        (1, "a", "w " * 100),   # 100 tokens in source a
        (2, "a", "w " * 100),
        (3, "b", "w " * 50),    # 50 tokens in source b
        (4, "c", "w " * 10),    # unweighted source
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    plan = {
        r["source"]: r.asDict()
        for r in mixture_plan(
            df, "source", "text", {"a": 3.0, "b": 1.0, "zz": 5.0}, 400
        ).collect()
    }
    # zz absent -> ignored; sum(w) over present = 4.0
    assert plan["a"]["available_tokens"] == 200
    assert plan["a"]["target_tokens"] == 300.0     # 400 * 3/4
    assert plan["a"]["fraction"] == 1.5 and plan["a"]["epochs"] == 2
    assert plan["b"]["target_tokens"] == 100.0 and plan["b"]["epochs"] == 2
    assert plan["c"]["weight"] == 0.0 and plan["c"]["fraction"] == 0.0
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "text", {"a": 1.0}, 0)
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "text", {}, 100)
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "text", {"zz": 1.0}, 100)


def test_mixture_plan_temperature(spark):
    """T→∞ flattens toward uniform; T=1 is identity; T<=0 rejected."""
    import pytest

    from paradump_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", "w " * 10), ("b", "w " * 10)], "source string, text string"
    )
    w = {"a": 4.0, "b": 1.0}
    base = {
        r["source"]: r["target_tokens"]
        for r in mixture_plan(df, "source", "text", w, 1000).collect()
    }
    ident = {
        r["source"]: r["target_tokens"]
        for r in mixture_plan(
            df, "source", "text", w, 1000, temperature=1.0
        ).collect()
    }
    assert base == ident
    assert base["a"] == 800.0 and base["b"] == 200.0
    flat = {
        r["source"]: r["target_tokens"]
        for r in mixture_plan(
            df, "source", "text", w, 1000, temperature=100.0
        ).collect()
    }
    # nearly uniform at high T
    assert abs(flat["a"] - flat["b"]) < 20
    # T=2: 4^0.5 : 1^0.5 = 2 : 1
    t2 = {
        r["source"]: r["target_tokens"]
        for r in mixture_plan(
            df, "source", "text", w, 1000, temperature=2.0
        ).collect()
    }
    assert round(t2["a"] / t2["b"], 6) == 2.0
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "text", w, 1000, temperature=0)
