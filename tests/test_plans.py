"""Physical-plan regression tests: the scale properties (pushdown,
pruning, join strategy, partial aggregation, no Python in hot paths) as
assertions, so a future refactor can't silently regress them."""

from pyspark.sql import functions as F

import __spark_entry__ as E
from paradump_spark.operators.dedup import minhash_signatures
from paradump_spark.operators.diff import diff_classified
from paradump_spark.sinks.files import rendered_tuples


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") > 100)
        .select("o_orderkey", "o_totalprice")
    )
    p = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,100)" in p
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in p


def test_diff_uses_sort_merge_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = _plan(diff_classified(li, li.limit(100000), ["l_orderkey", "l_linenumber"]))
    assert "SortMergeJoin" in p
    assert "CartesianProduct" not in p


def test_dim_join_broadcasts_small_side(spark, sf_dir):
    p = _plan(E._q_segment_order_stats(spark, sf_dir))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_q1_aggregates_partially_with_pruned_scan(spark, sf_dir):
    p = _plan(E._q_q1_pricing_summary(spark, sf_dir))
    assert "partial" in p  # map-side partial aggregation
    assert "l_orderkey" not in p.split("ReadSchema")[1][:400]  # pruned


def test_chunk_coverage_is_single_scan(spark, sf_dir):
    p = _plan(E._q_chunk_coverage_orders(spark, sf_dir))
    assert p.count("Scan parquet") == 1


def test_render_path_has_no_python_and_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = _plan(rendered_tuples(li))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


def test_minhash_partial_aggregates_before_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(minhash_signatures(docs, "doc_id", "text"))
    assert "partial_min" in p
    # fixed-width BIGINT signatures must hash-aggregate, not sort-aggregate
    assert "HashAggregate" in p and "SortAggregate" not in p


def test_ann_broadcasts_queries(spark, sf_dir):
    p = _plan(E._q_ann_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
