"""Skew mitigation — salting for hot keys (SURVEY §4 X6 companion).

AQE's skew-join splitting (on by default, session.py) covers sort-merge
joins at runtime; these helpers cover the two cases AQE doesn't:

* **salted_agg** — two-phase aggregation for algebraic functions: a hot
  group key first aggregates across ``buckets`` sub-groups (map-side +
  one narrow shuffle spread over buckets), then the partials combine in a
  second tiny shuffle.  Turns one reducer processing the whole hot key
  into ``buckets`` reducers.
* **salted_join** — explicit replicate-small/salt-big equi-join for when
  the small side is too big to broadcast but the big side has hot keys:
  the big side gets a deterministic salt in [0, buckets), the small side
  is replicated once per salt value, and the join key becomes
  (key, salt) — hot keys spread over ``buckets`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # partial counts combine by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (function, input column) with function
    ∈ {sum, count, min, max} (algebraic: partials combine losslessly).
    Results equal the plain ``groupBy(keys).agg(...)`` exactly — integer
    and decimal sums are exact; double sums may differ in the last ulp
    like any distributed reordering.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn} is not an algebraic aggregate")
    # deterministic spread: hash of the whole row modulo buckets
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0](F.col(col)).alias(f"__p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small.

    Output equals ``big.join(small, on, how)`` for inner/left joins.
    Small side grows ×``buckets`` — use only when it can't broadcast but
    fits ×buckets in the shuffle.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, not {how!r}: "
            "unmatched small-side rows would appear once per salt replica"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(buckets))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = b.join(s, on=on + ["__salt"], how=how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_k: int = 20,
) -> DataFrame:
    """Key-skew diagnosis BEFORE choosing a mitigation: the ``top_k``
    hottest key values with their row counts, each key's share of the
    table, and the hot/average imbalance factor — the number that says
    whether a plain shuffle is fine (≈ 1), AQE's skew-join split will
    cope (≲ 10), or :func:`salted_agg` / :func:`salted_join` is needed.

    Output: (key columns…, n_rows, share, imbalance) ordered hottest
    first.  ``imbalance`` = key's count ÷ mean rows-per-distinct-key; a
    key with imbalance 500 funnels 500 tasks' worth of its shuffle
    partition through one reducer.

    One partially-aggregated groupBy (the same shuffle the real job
    would pay) + a single-row global aggregate; ``top_k`` rows reach
    the driver only if collected.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") * F.col("__n_keys") / F.col("__total"), 3
            ).alias("imbalance"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
        .limit(top_k)
    )
