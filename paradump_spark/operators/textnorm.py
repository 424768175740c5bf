"""Text normalization — the first pass of any corpus-prep pipeline.

Crawled text arrives with control characters, zero-width code points,
BOMs, and run-on whitespace that break tokenizers, inflate dedup
signatures (two visually-identical documents hash differently), and
leak into training data.  Normalize BEFORE dedup/quality so every
downstream signature keys on the canonical form.

Scale shape: the strip/collapse path is pure JVM regex — a narrow
projection fused into the scan.  Unicode NFC composition has no Spark
built-in, so it is an Arrow-batched UDF (stdlib ``unicodedata``, no
external deps) behind an explicit flag; the DuckDB oracle reproduces it
with ``nfc_normalize``.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf hints under PEP 563
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0 controls except \t \n \r, plus DEL (Java and RE2 agree on these
#: explicit ranges — no \p{Cc} so the oracle is byte-identical)
CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

#: zero-width space/joiners + BOM (the invisible dedup poison)
ZERO_WIDTH_RE = "[\\u200B\\u200C\\u200D\\uFEFF]"


def normalize_text_expr(col: Column | str) -> Column:
    """Canonical text: control chars and zero-width code points removed,
    horizontal whitespace runs collapsed to one space, lines trimmed.
    Pure JVM expression chain — engine-reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, CONTROL_RE, "")
    c = F.regexp_replace(c, ZERO_WIDTH_RE, "")
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    # edge-trim spaces AND newlines (F.trim strips spaces only)
    return F.regexp_replace(c, "^[ \\n]+|[ \\n]+$", "")


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    nfc: bool = False,
) -> DataFrame:
    """Append the normalized text plus ``n_removed_chars`` (how much was
    stripped/collapsed — a crawl-health signal worth monitoring).

    ``nfc=True`` additionally applies Unicode NFC composition (combining
    sequences → precomposed forms) through an Arrow-batched UDF; off by
    default because most pipelines only need it for non-Latin corpora.
    """
    out = out_col or text_col
    cleaned = normalize_text_expr(F.col(text_col))
    if nfc:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def to_nfc(texts: pd.Series) -> pd.Series:
            import unicodedata

            return texts.map(
                lambda t: unicodedata.normalize("NFC", t)
                if t is not None
                else None
            )

        cleaned = to_nfc(cleaned)
    keep = [c for c in df.columns if c != text_col or out != text_col]
    return (
        df.select(
            *keep,
            F.length(F.col(text_col)).alias("__len_in"),
            cleaned.alias(out),
        )
        .withColumn(
            "n_removed_chars",
            (F.col("__len_in") - F.length(F.col(out))).cast("long"),
        )
        .drop("__len_in")
    )
