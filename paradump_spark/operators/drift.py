"""Distribution-drift detection between two corpus snapshots — the
data-quality gate in front of retraining.

Production pipelines re-ingest continuously; before a new snapshot
replaces (or extends) the training corpus, per-column Population
Stability Index (PSI) against the blessed baseline catches silent
upstream changes (a scraper losing a locale, a price field switching
units) that row counts and schema checks miss.

PSI(base → new) = Σ_bins (p_new − p_base) · ln(p_new / p_base);
rule-of-thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.

Scale shape: each histogram is ONE partially-aggregated pass (bin id is
a pure projection, combine happens map-side; the result is n_bins rows).
PSI is then arithmetic over 2 × n_bins rows — driver-free, join on the
bin id.  Bin bounds are CALLER-SUPPLIED, which is what makes drift
comparable across runs and engines: the blessed baseline's bounds are
part of the contract, not re-derived from whatever data shows up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Laplace-style smoothing count per bin so empty bins keep ln() finite;
#: the conventional alternative (clipping p to 1e-4) makes PSI saturate,
#: additive smoothing keeps it monotone in the divergence.
SMOOTH = 0.5


def bin_id(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Equal-width bin in ``[0, n_bins)``; values at/under ``lo`` land in
    bin 0, at/over ``hi`` in ``n_bins - 1`` (open-ended edge bins, the
    standard PSI convention so outliers are counted, not dropped)."""
    if hi <= lo:
        raise ValueError("hi must exceed lo")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    raw = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi - lo))
        * F.lit(n_bins)
    )
    return F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)).cast("int")


def histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, n_rows) for every occupied bin — one partial-agg pass.
    NULLs are excluded (count them separately via the profiler)."""
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(bin_id(F.col(value_col), lo, hi, n_bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def psi_report(
    base: DataFrame,
    new: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI decomposition + totals, engine-reproducible.

    Output: one row per bin (all ``n_bins``, occupied or not) with
    smoothed fractions and the bin's PSI term (rounded to 6), ordered by
    bin.  ``sum(psi_term)`` is the PSI; emitting the decomposition keeps
    the report actionable (WHICH value range moved).
    """
    spark = base.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    hb = histogram(base, value_col, lo, hi, n_bins).withColumnRenamed(
        "n_rows", "n_base"
    )
    hn = histogram(new, value_col, lo, hi, n_bins).withColumnRenamed(
        "n_rows", "n_new"
    )
    joined = (
        bins.join(F.broadcast(hb), "bin", "left")
        .join(F.broadcast(hn), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    totals = joined.agg(
        F.sum("n_base").cast("double").alias("t_base"),
        F.sum("n_new").cast("double").alias("t_new"),
    )
    p_base = (F.col("n_base") + F.lit(SMOOTH)) / (
        F.col("t_base") + F.lit(SMOOTH * n_bins)
    )
    p_new = (F.col("n_new") + F.lit(SMOOTH)) / (
        F.col("t_new") + F.lit(SMOOTH * n_bins)
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_base",
            "n_new",
            F.round(p_base, 6).alias("frac_base"),
            F.round(p_new, 6).alias("frac_new"),
            F.round((p_new - p_base) * F.log(p_new / p_base), 6).alias(
                "psi_term"
            ),
        )
        .orderBy("bin")
    )


def psi_value(
    base: DataFrame,
    new: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> float:
    """Scalar PSI (driver-side convenience over :func:`psi_report`)."""
    row = (
        psi_report(base, new, value_col, lo, hi, n_bins)
        .agg(F.sum("psi_term").alias("psi"))
        .collect()[0]
    )
    return float(row["psi"])


def drift_report(
    base: DataFrame,
    new: DataFrame,
    bounds: dict[str, tuple[float, float]],
    n_bins: int = 10,
) -> DataFrame:
    """Multi-column drift summary: one row per column with its PSI.
    ``bounds`` maps column → (lo, hi) from the blessed baseline profile.
    """
    out = None
    for col, (lo, hi) in bounds.items():
        one = (
            psi_report(base, new, col, lo, hi, n_bins)
            .agg(F.round(F.sum("psi_term"), 6).alias("psi"))
            .select(F.lit(col).alias("column_name"), "psi")
        )
        out = one if out is None else out.unionAll(one)
    if out is None:
        raise ValueError("bounds must name at least one column")
    return out
