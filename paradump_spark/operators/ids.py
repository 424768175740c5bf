"""Stable ID assignment + collision audit.

Joining corpora across systems needs an integer key that is a pure
function of content — `monotonically_increasing_id` and `zipWithIndex`
change with partitioning and history, so re-runs break referential
integrity.  A content-hash id (60 bits of md5, same convention as
`operators.sampling.hash_bucket` / `sinks.shards`) is reproducible in
any engine; the price is a birthday-bound collision risk, so the audit
that PROVES uniqueness on the actual data ships next to the generator.

Scale: assignment is a pure projection; the audit is one
partially-aggregated pass keyed by the id (collision candidates only —
the groupBy output is id-cardinality-bounded).  At 60 bits the expected
collision count for N keys is ~N²/2^61 (≈ 0.004 at N = 10^8; audit and
widen to two hash columns if it ever fires).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_id(*cols: Column | str, bits: int = 60) -> Column:
    """60-bit (default) integer id from the md5 of the key columns.

    Multi-column keys are joined with the 0x1f unit separator after a
    NULL sentinel, exactly like `operators.checksum`'s row hash, so
    ("a", NULL) and ("a\\x00", "") cannot alias.  DuckDB spelling:
    ``('0x' || substr(md5(<concat>), 1, 15))::BIGINT`` (15 hex = 60
    bits).
    """
    if not 4 <= bits <= 60:
        raise ValueError("bits must be in [4, 60] (15 hex digits max)")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.concat_ws(
        "\x1f", *[F.coalesce(c.cast("string"), F.lit("\x00")) for c in cs]
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    if bits == 60:
        return h
    return h % F.lit(1 << bits)


def assign_stable_ids(
    df: DataFrame, key_cols: list[str], out_col: str = "stable_id"
) -> DataFrame:
    """Append ``out_col`` derived from ``key_cols`` — a narrow
    projection, no shuffle."""
    return df.withColumn(out_col, stable_id(*key_cols))


def collision_report(
    df: DataFrame, key_cols: list[str], bits: int = 60
) -> DataFrame:
    """One row: (n_keys, n_ids, n_collisions) over the DISTINCT keys.

    ``n_collisions`` = distinct keys − distinct ids: 0 proves the id is
    injective on this corpus.  One aggregation pass; run it once per
    ingest and alarm on nonzero.
    """
    keyed = df.select(
        *[F.col(c) for c in key_cols],
        stable_id(*key_cols, bits=bits).alias("__id"),
    ).distinct()
    return keyed.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("__id").alias("n_ids"),
        (F.count(F.lit(1)) - F.countDistinct("__id")).alias("n_collisions"),
    )
