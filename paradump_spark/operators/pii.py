"""PII detection / redaction over a documents table — beyond-reference
LLM-pipeline surface (the reference engine has no text analytics; this
extends `operators/text_analysis.py`).

Training-data pipelines scrub personally-identifying strings before
anything else touches the text.  Everything here is a per-row JVM
projection (``regexp_count`` / ``regexp_replace``) — no shuffle, no UDF,
column-pruned to the text column; at 100 TB it fuses into the scan and
runs at codegen speed.

The patterns are deliberately written in the common Java-regex ∩ RE2
subset (no lookaround, no backrefs, explicit ASCII classes) so the
DuckDB correctness oracle reproduces them byte-for-byte.  They are
pragmatic web-scrub patterns, not validators: a string shaped like a
card number is redacted whether or not it Luhn-checks — for a training
corpus, over-redaction is the safe direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top-to-bottom, each pass sees the previous
# pass's placeholders, so e.g. the digits of an already-redacted card
# can never be re-matched as a phone number.  Detection counts, by
# contrast, all run on the ORIGINAL text (a rare overlapping match may
# count under two classes; counts are per-class signals, not a
# partition of the string).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9]{4}[\- ]?[0-9]{4}[\- ]?[0-9]{4}[\- ]?[0-9]{4}\b",
    "phone": r"(?:\+?[0-9]{1,3}[\-. (]{1,2})?[0-9]{3}[\-. )]{1,2}[0-9]{3}[\-. ][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "credit_card": "<CREDIT_CARD>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """Per-class match counts on the raw text (one ``regexp_count``
    expression per class; all fuse into a single projection)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact(text_col: Column | str) -> Column:
    """Text with every PII class replaced by its placeholder, applied in
    ``PII_PATTERNS`` order (card before phone, so card digits are gone
    before the looser phone pattern runs)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, REDACTION_TOKENS[name])
    return c


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII profile: one count column per class plus the
    total and a ``has_pii`` flag.  Pure projection — scales as the scan."""
    counts = pii_counts(text_col)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return df.select(
        F.col(id_col),
        *[col.alias(f"n_{name}") for name, col in counts.items()],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """All input columns plus (or replacing) the redacted text."""
    return df.withColumn(out_col or text_col, redact(text_col))


def pii_summary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-level rollup: documents affected and matches per class.
    One partial-aggregated reduce to a single row — no wide shuffle."""
    stats = pii_stats(df, id_col, text_col)
    aggs = []
    for name in PII_PATTERNS:
        aggs.append(F.sum(f"n_{name}").cast("long").alias(f"total_{name}"))
        aggs.append(
            F.sum((F.col(f"n_{name}") > 0).cast("long")).alias(f"docs_{name}")
        )
    return stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("has_pii").cast("long")).alias("docs_with_pii"),
        F.sum("n_pii").cast("long").alias("total_matches"),
        *aggs,
    )


def oracle_redact_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SQL equivalent of :func:`redact` (global-flag
    ``regexp_replace`` chained in the same class order)."""
    expr = text_col
    for name, pat in PII_PATTERNS.items():
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{REDACTION_TOKENS[name]}', 'g')"
    return f"SELECT {id_col}, {expr} AS redacted FROM {table}"


def oracle_pii_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SQL equivalent of :func:`pii_stats` (driver oracle)."""
    cols = [id_col]
    total = []
    for name, pat in PII_PATTERNS.items():
        p = pat.replace("'", "''")
        cols.append(
            f"CAST(len(regexp_extract_all({text_col}, '{p}')) AS BIGINT) AS n_{name}"
        )
        total.append(f"CAST(len(regexp_extract_all({text_col}, '{p}')) AS BIGINT)")
    tot = " + ".join(total)
    cols.append(f"({tot}) AS n_pii")
    cols.append(f"(({tot}) > 0) AS has_pii")
    return f"SELECT {', '.join(cols)} FROM {table}"
