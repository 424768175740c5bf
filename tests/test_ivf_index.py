"""Materialized IVF index: partition-pruned search correctness + the
pruning itself visible in the physical plan."""

from pyspark.sql import functions as F

from paradump_spark.operators.similarity import (
    brute_force_topk,
    ivf_build_index,
    ivf_query_index,
)


def test_ivf_index_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    ivf_build_index(emb, path, "vec_id", "embedding", num_cells=8)

    q = emb.where(F.col("vec_id") < 3)
    out = ivf_query_index(spark, path, q, "vec_id", "embedding", k=3, nprobe=8)
    rows = out.collect()
    # nprobe = all cells -> exact: matches brute force
    bf = brute_force_topk(emb, q, "vec_id", "embedding", k=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, bf))

    # partition pruning: with nprobe=2 the corpus scan must carry a
    # cell_id partition filter
    out2 = ivf_query_index(spark, path, q, "vec_id", "embedding", k=3, nprobe=2)
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_id" in plan.replace("#", " #").replace(
        "cell_id ", "cell_id"
    ) or "cell_id IN" in plan
    # and self must still be its own rank-1 neighbor
    r1 = {r["query_id"]: r["neighbor_id"] for r in out2.collect() if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1, 2: 2}


def test_ann_recall_is_one_at_full_probe_and_detects_loss(spark, sf_dir, tmp_path):
    from paradump_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_build_index,
        ivf_query_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)

    path = str(tmp_path / "ivf")
    ivf_build_index(emb, path, "vec_id", "embedding", num_cells=8)
    full = ivf_query_index(spark, path, queries, "vec_id", "embedding", k=5, nprobe=8)
    r = ann_recall(full, exact).collect()[0]
    assert r["n_queries"] == 20 and r["mean_recall"] == 1.0

    narrow = ivf_query_index(spark, path, queries, "vec_id", "embedding", k=5, nprobe=1)
    r1 = ann_recall(narrow, exact).collect()[0]
    # genuinely degraded (0.4 on this deterministic data) — a no-op
    # nprobe regression would bring this back to 1.0 and fail here
    assert 0.0 < r1["mean_recall"] < 1.0


def test_kmeans_refine_stable_cells_and_exact_at_full_probe(spark, sf_dir, tmp_path):
    from paradump_spark.operators.similarity import (
        ann_recall,
        ivf_centroids,
        kmeans_refine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sampled = ivf_centroids(emb, "vec_id", "embedding", num_cells=8)
    refined = kmeans_refine(emb, sampled, "vec_id", "embedding", iters=2)

    # cell count and schema survive refinement (index layout is stable)
    assert refined.count() == 8
    assert [f.name for f in refined.schema.fields] == ["cell_id", "centroid"]
    assert refined.schema["centroid"].dataType.simpleString() == "array<float>"

    # refinement actually moved the centroids (Lloyd step is not a no-op)
    s = {r["cell_id"]: r["centroid"] for r in sampled.collect()}
    r = {r["cell_id"]: r["centroid"] for r in refined.collect()}
    assert set(s) == set(r)
    assert any(s[c] != r[c] for c in s)

    # refined centroids are unit-norm (spherical k-means invariant)
    import math

    for vec in r.values():
        assert math.isclose(sum(v * v for v in vec), 1.0, rel_tol=1e-3)

    # a refined index at nprobe=all is still exact
    path = str(tmp_path / "ivf_ref")
    ivf_build_index(
        emb, path, "vec_id", "embedding", num_cells=8, refine_iters=2
    )
    q = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    full = ivf_query_index(spark, path, q, "vec_id", "embedding", k=5, nprobe=8)
    rec = ann_recall(full, exact).collect()[0]
    assert rec["n_queries"] == 20 and rec["mean_recall"] == 1.0


def test_kmeans_refine_empty_cell_keeps_previous_centroid(spark):
    from paradump_spark.operators.similarity import kmeans_refine

    # two tight clusters + a third centroid far away that wins nothing:
    # after refinement the empty cell must keep its previous centroid.
    corpus = spark.createDataFrame(
        [(i, [1.0 + 0.01 * i, 0.0]) for i in range(5)]
        + [(10 + i, [0.0, 1.0 + 0.01 * i]) for i in range(5)],
        "id long, v array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, -1.0])],
        "cell_id int, centroid array<float>",
    )
    out = kmeans_refine(corpus, cents, "id", "v", iters=1)
    got = {r["cell_id"]: r["centroid"] for r in out.collect()}
    assert set(got) == {0, 1, 2}
    assert got[2] == [-1.0, -1.0]
