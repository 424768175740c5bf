"""Corpus datasheet — the "data card" JSON a dataset release ships with.

Composes the existing signal operators (volumes, token counts, Gopher
keep rate, PII totals, exact-dup rate, length percentiles, per-source /
per-language breakdowns) into one bounded driver-side dict.  Teams cut
releases on exactly this artifact; producing it from the same operator
code that filters the corpus means the card can never drift from the
pipeline's actual behavior.

Plan shape: ONE global aggregate (all scalar stats + PII counters in a
single pass), one groupBy per requested breakdown column (bounded by
that column's cardinality, capped at ``max_groups``), and one hash
shuffle for the exact-duplicate rate.  Nothing scales with corpus size
on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX
from paradump_spark.operators.pii import pii_counts
from paradump_spark.operators.quality_rules import gopher_keep


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    breakdown_cols: tuple[str, ...] = (),
    max_groups: int = 100,
    include_dup_rate: bool = True,
) -> dict:
    """Build the datasheet dict (JSON-serializable).

    ``breakdown_cols``: categorical columns (source, lang, …) to slice
    volumes by — each costs one partial-agg groupBy, truncated to the
    ``max_groups`` largest groups (truncation is REPORTED, never
    silent).  ``include_dup_rate=False`` skips the one extra shuffle
    when the corpus is already deduped.
    """
    toks = TX.token_count(F.col(text_col))
    chars = F.length(F.col(text_col))
    pii = pii_counts(text_col)
    total_pii = None
    for c in pii.values():
        total_pii = c if total_pii is None else total_pii + c

    row = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars.cast("long")).alias("n_chars"),
        F.sum(toks.cast("long")).alias("n_tokens"),
        F.sum(F.col(text_col).isNull().cast("long")).alias("n_null_text"),
        F.percentile_approx(toks, [0.1, 0.5, 0.9, 0.99], 10000).alias(
            "token_percentiles"
        ),
        F.sum(gopher_keep(text_col).cast("long")).alias("n_gopher_keep"),
        F.sum(total_pii.cast("long")).alias("n_pii_matches"),
        F.sum((total_pii > 0).cast("long")).alias("n_docs_with_pii"),
    ).collect()[0]
    n_docs = int(row["n_docs"])
    report: dict = {
        "n_docs": n_docs,
        "n_chars": int(row["n_chars"] or 0),
        "n_tokens": int(row["n_tokens"] or 0),
        "n_null_text": int(row["n_null_text"]),
        "token_percentiles": {
            p: int(v)
            for p, v in zip(
                ("p10", "p50", "p90", "p99"), row["token_percentiles"] or []
            )
        },
        "gopher_keep_rate": (
            round(int(row["n_gopher_keep"]) / n_docs, 6) if n_docs else None
        ),
        "pii": {
            "n_matches": int(row["n_pii_matches"] or 0),
            "n_docs_with_pii": int(row["n_docs_with_pii"] or 0),
        },
    }

    if include_dup_rate and n_docs:
        n_distinct = (
            docs.where(F.col(text_col).isNotNull())
            .select(F.md5(F.col(text_col)).alias("__h"))
            .distinct()
            .count()
        )
        n_non_null = n_docs - report["n_null_text"]
        report["exact_dup_rate"] = round(
            (n_non_null - n_distinct) / n_non_null, 6
        ) if n_non_null else 0.0

    for col in breakdown_cols:
        groups = (
            docs.groupBy(col)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(toks.cast("long")).alias("n_tokens"),
            )
            .orderBy(F.desc("n_docs"), F.asc(col))
            .limit(max_groups + 1)
            .collect()
        )
        truncated = len(groups) > max_groups
        report[f"by_{col}"] = {
            str(r[col]): {
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"] or 0),
            }
            for r in groups[:max_groups]
        }
        if truncated:
            report[f"by_{col}_truncated_at"] = max_groups

    return report
