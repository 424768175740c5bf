"""paradump_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ErwanMAS/paradump (parallel consistent-snapshot
table dumper/copier + chunk-wise table diff/repair), re-expressed Spark-first.

The reference (/root/reference, Go) is a single-process pipelined engine:
browser -> reader -> generator -> writer goroutine stages over bounded
channels.  Here each of those stages maps onto Spark's execution model:

* browser (PK-interval discovery)   -> driver-side split planning
  (:mod:`paradump_spark.plans.split`) producing JDBC ``predicates[]`` or
  partition bounds — no sequential LIMIT-walk.
* reader (chunk fetch)              -> partitioned DataFrame read
  (:mod:`paradump_spark.sources`); each predicate = one partition/task.
* generator (dialect SQL rendering) -> vectorized expressions / pandas UDFs
  (:mod:`paradump_spark.functions.render`).
* writer (files / DB)               -> :mod:`paradump_spark.sinks`.
* parasync's sorted-merge diff      -> full-outer join diff
  (:mod:`paradump_spark.operators.diff`) — Catalyst picks SMJ/broadcast.

Beyond the reference surface, :mod:`paradump_spark.operators` adds the
large-scale training-data pipeline operators: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
search, text analysis, and multimodal column plumbing.
"""

from paradump_spark.session import build_session, get_session

__all__ = ["build_session", "get_session"]

__version__ = "0.1.0"
