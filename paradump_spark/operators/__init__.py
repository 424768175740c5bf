from paradump_spark.operators.diff import DiffResult, diff_stats, diff_tables

__all__ = ["DiffResult", "diff_stats", "diff_tables"]
