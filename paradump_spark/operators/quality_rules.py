"""Gopher-style document quality rules — beyond-reference LLM-pipeline
surface (heuristic rule set from Rae et al. 2021, "Scaling Language
Models: ... Gopher", Appendix A1.1, reproduced in every public pipeline
since: C4, RefinedWeb, Dolma, FineWeb).

Each rule is a boolean per-document flag computed with pure JVM array /
regexp expressions (split → filter → size) — no shuffle, no UDF,
column-pruned to the text column.  At 100 TB this is a map-only pass
that fuses into the parquet scan, exactly like `text_analysis.py`.

Thresholds follow the published defaults but are parameters; the SQL
oracle builder mirrors every expression in DuckDB's lambda dialect so
the driver verifies values, not just shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX

# the Gopher "must contain 2 of these" stopword list
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@dataclass(frozen=True)
class GopherThresholds:
    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_word_ratio: float = 0.1
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_word_frac: float = 0.8
    min_stopword_hits: int = 2


def _words(text_col: Column) -> Column:
    # whitespace words; filter('' ) guards leading/trailing spaces
    return F.filter(F.split(text_col, r"\s+"), lambda w: w != "")


def _lines(text_col: Column) -> Column:
    return F.filter(F.split(text_col, "\n"), lambda l: l != "")


def gopher_metrics(
    text_col: Column | str,
) -> dict[str, Column]:
    """The raw per-document metric expressions, by output column name.

    Ratios are rounded to 6 decimals before thresholding so the DuckDB
    oracle (same rounding) can never straddle a float boundary
    differently.
    """
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.size(lines)

    sum_len = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    mean_wl = F.round(
        F.when(n_words > 0, sum_len.cast("double") / n_words).otherwise(F.lit(0.0)),
        6,
    )
    # '#' occurrences + '...' occurrences, per word
    n_symbols = (
        F.regexp_count(text, F.lit("#"))
        + F.regexp_count(text, F.lit(r"\.\.\."))
    ).cast("long")
    sym_ratio = F.round(
        F.when(n_words > 0, n_symbols.cast("double") / n_words).otherwise(F.lit(0.0)),
        6,
    )
    bullet_frac = F.round(
        F.when(
            n_lines > 0,
            F.size(
                F.filter(
                    lines,
                    lambda l: l.rlike("^[\\s]*[-*•]"),
                )
            ).cast("double")
            / n_lines,
        ).otherwise(F.lit(0.0)),
        6,
    )
    ellipsis_frac = F.round(
        F.when(
            n_lines > 0,
            F.size(
                F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)[\\s]*$"))
            ).cast("double")
            / n_lines,
        ).otherwise(F.lit(0.0)),
        6,
    )
    alpha_frac = F.round(
        F.when(
            n_words > 0,
            F.size(
                F.filter(words, lambda w: w.rlike("[A-Za-z]"))
            ).cast("double")
            / n_words,
        ).otherwise(F.lit(0.0)),
        6,
    )
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_word_ratio": sym_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stopword_hits": stop_hits.cast("long"),
    }


def gopher_flags(
    text_col: Column | str,
    th: GopherThresholds = GopherThresholds(),
) -> dict[str, Column]:
    """Per-rule boolean expressions plus the ``keep`` conjunction."""
    m = gopher_metrics(text_col)
    flags = {
        "pass_word_count": (m["n_words"] >= th.min_words)
        & (m["n_words"] <= th.max_words),
        "pass_mean_word_len": (m["mean_word_len"] >= th.min_mean_word_len)
        & (m["mean_word_len"] <= th.max_mean_word_len),
        "pass_symbol_ratio": m["symbol_word_ratio"] <= th.max_symbol_word_ratio,
        "pass_bullet_lines": m["bullet_line_frac"] <= th.max_bullet_line_frac,
        "pass_ellipsis_lines": m["ellipsis_line_frac"]
        <= th.max_ellipsis_line_frac,
        "pass_alpha_words": m["alpha_word_frac"] >= th.min_alpha_word_frac,
        "pass_stopwords": m["stopword_hits"] >= th.min_stopword_hits,
    }
    keep = None
    for col in flags.values():
        keep = col if keep is None else keep & col
    flags["keep"] = keep
    return flags


def gopher_keep(
    text_col: Column | str, th: GopherThresholds = GopherThresholds()
) -> Column:
    """The ``keep`` conjunction alone — usable directly in ``where`` so a
    filter stays a map-only pass (no join, pushes into the scan)."""
    return gopher_flags(text_col, th)["keep"]


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    th: GopherThresholds = GopherThresholds(),
) -> DataFrame:
    """Per-document metric columns, rule flags, and the ``keep``
    conjunction."""
    metrics = gopher_metrics(text_col)
    flags = gopher_flags(text_col, th)
    return df.select(
        F.col(id_col),
        *[col.alias(name) for name, col in metrics.items()],
        *[col.alias(name) for name, col in flags.items()],
    )


def gopher_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    th: GopherThresholds = GopherThresholds(),
) -> DataFrame:
    """Documents surviving every rule — a plain ``where`` on the inline
    ``keep`` expression: map-only, no join, Catalyst pushes it at the
    scan."""
    return df.where(gopher_keep(text_col, th))


def oracle_gopher_sql(
    table: str,
    id_col: str,
    text_col: str,
    th: GopherThresholds = GopherThresholds(),
) -> str:
    """DuckDB SQL mirroring :func:`gopher_rules` expression-for-expression."""
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    w = f"list_filter(string_split_regex({text_col}, '\\s+'), x -> x <> '')"
    l = f"list_filter(string_split({text_col}, chr(10)), x -> x <> '')"
    return f"""
WITH base AS (
  SELECT {id_col},
         {w} AS words,
         {l} AS lines,
         CAST(len(regexp_extract_all({text_col}, '#')) AS BIGINT)
           + CAST(len(regexp_extract_all({text_col}, '\\.\\.\\.')) AS BIGINT)
           AS n_symbols
  FROM {table}
), m AS (
  SELECT {id_col},
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(len(lines) AS BIGINT) AS n_lines,
         n_symbols,
         round(CASE WHEN len(words) > 0 THEN
             CAST(list_sum(list_transform(words, x -> CAST(length(x) AS BIGINT)))
                  AS DOUBLE) / len(words) ELSE 0.0 END, 6) AS mean_word_len,
         round(CASE WHEN len(words) > 0 THEN
             CAST(n_symbols AS DOUBLE) / len(words) ELSE 0.0 END, 6)
           AS symbol_word_ratio,
         round(CASE WHEN len(lines) > 0 THEN
             CAST(len(list_filter(lines, x -> regexp_matches(x, '^[\\s]*[-*•]')))
                  AS DOUBLE) / len(lines) ELSE 0.0 END, 6) AS bullet_line_frac,
         round(CASE WHEN len(lines) > 0 THEN
             CAST(len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)[\\s]*$')))
                  AS DOUBLE) / len(lines) ELSE 0.0 END, 6) AS ellipsis_line_frac,
         round(CASE WHEN len(words) > 0 THEN
             CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / len(words) ELSE 0.0 END, 6) AS alpha_word_frac,
         CAST(len(list_filter([{stop_list}],
             s -> list_contains(list_transform(words, x -> lower(x)), s)))
           AS BIGINT) AS stopword_hits
  FROM base
)
SELECT {id_col}, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
       ellipsis_line_frac, alpha_word_frac, stopword_hits,
       (n_words >= {th.min_words} AND n_words <= {th.max_words}) AS pass_word_count,
       (mean_word_len >= {th.min_mean_word_len}
         AND mean_word_len <= {th.max_mean_word_len}) AS pass_mean_word_len,
       (symbol_word_ratio <= {th.max_symbol_word_ratio}) AS pass_symbol_ratio,
       (bullet_line_frac <= {th.max_bullet_line_frac}) AS pass_bullet_lines,
       (ellipsis_line_frac <= {th.max_ellipsis_line_frac}) AS pass_ellipsis_lines,
       (alpha_word_frac >= {th.min_alpha_word_frac}) AS pass_alpha_words,
       (stopword_hits >= {th.min_stopword_hits}) AS pass_stopwords,
       ((n_words >= {th.min_words} AND n_words <= {th.max_words})
         AND (mean_word_len >= {th.min_mean_word_len}
              AND mean_word_len <= {th.max_mean_word_len})
         AND (symbol_word_ratio <= {th.max_symbol_word_ratio})
         AND (bullet_line_frac <= {th.max_bullet_line_frac})
         AND (ellipsis_line_frac <= {th.max_ellipsis_line_frac})
         AND (alpha_word_frac >= {th.min_alpha_word_frac})
         AND (stopword_hits >= {th.min_stopword_hits})) AS keep
FROM m
"""
