"""paradump_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ErwanMAS/paradump (parallel consistent-
snapshot table dumper/copier + chunk-wise table diff/repair), re-expressed
Spark-first.

The reference (/root/reference, Go) is a single-process pipelined engine:
browser -> reader -> generator -> writer goroutine stages over bounded
channels.  Each stage maps onto Spark's execution model:

* browser (PK-interval discovery)   -> driver-side split planning
  (:mod:`paradump_spark.plans.split`) producing JDBC ``predicates[]`` or
  chunk Column filters — no sequential LIMIT-walk.
* reader (chunk fetch)              -> partitioned reads
  (:mod:`paradump_spark.sources.jdbc`); each predicate = one partition.
* generator (dialect SQL rendering) -> codegen'd expressions
  (:mod:`paradump_spark.functions.render`).
* writer (files / DB)               -> :mod:`paradump_spark.sinks`.
* parasync's sorted-merge diff      -> full-outer join diff
  (:mod:`paradump_spark.operators.diff`) — Catalyst picks SMJ/broadcast.

Top-level orchestration: :func:`paradump_spark.dump.dump_tables` (the
``paradump`` entry) and :func:`paradump_spark.sync.sync_tables` (the
``parasync`` entry).

Beyond the reference surface: LLM-data-pipeline operators — dedup
(:mod:`paradump_spark.operators.dedup`: exact, MinHash-LSH incl. an
incremental signature-store mode, SimHash, n-gram Jaccard, embedding
near-dup), similarity search (:mod:`paradump_spark.operators.similarity`),
text analysis (:mod:`paradump_spark.operators.text_analysis`: quality,
language-ID, repetition signals, vocabulary tf-df), deterministic
sampling/splits (:mod:`paradump_spark.operators.sampling`), FFD document
packing (:mod:`paradump_spark.operators.packing`), one-pass profiling
(:mod:`paradump_spark.operators.profile`), multimodal binary-column
plumbing (:mod:`paradump_spark.operators.multimodal`), lake layout
(:mod:`paradump_spark.plans.bucketing`, :mod:`paradump_spark.plans.zorder`),
and Structured Streaming rollups/stateful ops/dedup/continuous sync
(:mod:`paradump_spark.streaming`).
"""

from paradump_spark.session import build_session, get_session

__all__ = ["build_session", "get_session"]

__version__ = "0.2.0"
