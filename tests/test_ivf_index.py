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
