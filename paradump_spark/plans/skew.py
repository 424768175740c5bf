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


def salted_join_if_skewed(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    threshold: float = 8.0,
    buckets: int | None = None,
    how: str = "inner",
    sample_fraction: float | None = None,
    decision: dict | None = None,
    top_k: int = 32,
) -> DataFrame:
    """Auto-salt wiring (VERDICT r05 directive 8): consult
    :func:`skew_report` on the big side's join keys and pick the plan —
    plain equi-join when the hottest key's imbalance is ≤ ``threshold``
    (AQE's skew-join split copes below ~10×), hot/cold-split salting
    above it.  Results are identical either way.

    **Hot/cold split** (ADVICE r07): blanket :func:`salted_join` would
    replicate the ENTIRE small side ×buckets — in callers like
    ``fuzzy_join`` the "small" side is the full token-exploded corpus,
    so one Zipfian hot token could amplify a corpus-sized shuffle up to
    64×.  Instead, only the ≤ ``top_k`` measured-hot keys (imbalance >
    ``threshold``) take the salted path, and ONLY their small-side rows
    are replicated (a broadcast semi-join picks them out); every cold
    key goes through the plain equi-join.  Replication cost is thus
    O(top_k hot keys' small rows × buckets) regardless of |small|.
    Keys hotter than ``threshold`` but beyond rank ``top_k`` stay on
    the plain branch — AQE's skew-join split covers that middle band.

    The probe is ONE partial-aggregated count shuffle over the key
    columns only (projected first, so the scan is key-width); pass
    ``sample_fraction`` to probe a Bernoulli sample instead on very
    large inputs — imbalance ratios survive uniform sampling.

    ``buckets=None`` sizes the salt from the measurement:
    ``clamp(ceil(imbalance / threshold) * 8, 8, 64)`` — enough spread
    to pull the hot reducer under the threshold.

    ``decision`` (optional dict) is filled with what was measured and
    chosen — callers log it; tests assert on it.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # validate up front (ADVICE r06): the plain-join branch would
        # accept any `how`, making an unsupported join work or fail
        # depending on the measured imbalance at runtime
        raise ValueError(
            f"salted_join_if_skewed supports inner/left joins only, not "
            f"{how!r}: unmatched small-side rows would appear once per "
            "salt replica on the salted branch"
        )
    probe = big.select(*on)
    if sample_fraction is not None:
        probe = probe.sample(fraction=sample_fraction, seed=42)
    hot = skew_report(probe, on, top_k=top_k).collect()
    hot_rows = [r for r in hot if float(r["imbalance"]) > threshold]
    imbalance = float(hot[0]["imbalance"]) if hot else 0.0
    salted = bool(hot_rows)
    if buckets is None:
        import math

        buckets = min(64, max(8, int(math.ceil(imbalance / threshold)) * 8))
    if decision is not None:
        decision.update(
            imbalance=imbalance,
            salted=salted,
            buckets=buckets if salted else 0,
            hot_key={k: hot[0][k] for k in on} if hot else None,
            hot_keys_n=len(hot_rows),
        )
    if not salted:
        return big.join(small, on=on, how=how)
    # hot/cold split: the hot-key list is driver-bounded (≤ top_k rows)
    hotdf = big.sparkSession.createDataFrame(
        [tuple(r[k] for k in on) for r in hot_rows],
        schema=big.select(*on).schema,
    )
    hotb = F.broadcast(hotdf)
    big_hot = big.join(hotb, on, "left_semi")
    big_cold = big.join(hotb, on, "left_anti")
    # only hot keys' small rows get replicated ×buckets; NULL-key small
    # rows drop out of the semi-join, which is row-equal (an equi-join
    # never matches NULL keys)
    small_hot = small.join(hotb, on, "left_semi")
    cold = big_cold.join(small, on=on, how=how)
    hot_joined = salted_join(big_hot, small_hot, on, buckets=buckets, how=how)
    return cold.unionByName(hot_joined)


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
