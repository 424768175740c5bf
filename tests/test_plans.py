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


def test_exists_semi_join_broadcasts_filtered_side(spark, sf_dir):
    p = _plan(E._q_open_order_customers(spark, sf_dir))
    assert "LeftSemi" in p and "BroadcastHashJoin" in p
    # the status/price filter runs below the join build, not above it
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_cube_expands_then_partially_aggregates(spark, sf_dir):
    p = _plan(E._q_cube_order_stats(spark, sf_dir))
    assert "Expand" in p and "partial" in p
    assert p.count("Exchange") == 1  # one shuffle on (keys, grouping id)


def test_embedding_dim_stats_partial_agg_below_exchange(spark, sf_dir):
    p = _plan(E._q_embedding_dim_stats(spark, sf_dir))
    # plan prints top-down: exploded rows must combine per-dim (partial agg)
    # BELOW the exchange, i.e. later in the string
    assert "Generate posexplode" in p
    assert p.index("partial_min") > p.index("Exchange")
    assert "ReadSchema: struct<embedding" in p  # only the array column is read


def test_repetition_ratios_is_shuffle_free_scan(spark, sf_dir):
    p = _plan(E._q_repetition_ratios(spark, sf_dir))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_split_column_fuses_into_scan(spark, sf_dir):
    p = _plan(E._q_doc_split_counts(spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "ReadSchema: struct<doc_id" in p  # only the id column is read


def test_every_contract_query_plan_is_sane(spark, sf_dir):
    """Blanket regression over ALL contract queries: no cartesian
    products, no row-at-a-time Python eval anywhere (Arrow-batched
    MapInPandas is the sanctioned Python path)."""
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        p = _plan(df)
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name

