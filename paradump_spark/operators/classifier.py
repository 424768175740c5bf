"""Hashed-feature linear text classifier — the fasttext-style quality
scorer serving path, Spark-first.

Production corpora are filtered by lightweight linear classifiers over
hashed bag-of-words features (fasttext; CCNet/RedPajama quality
models).  The expensive part at 100 TB is SERVING: score every
document.  Here that is pure DataFrame ops:

- features: lowercase whitespace tokens → stable md5 bucket
  (:func:`..operators.sampling.hash_bucket` — engine-portable, no
  Python in the loop),
- scoring: explode tokens, broadcast-join the (tiny) weight table,
  per-document partial-aggregated sum → sigmoid.  A document's exploded
  tokens stay in their partition, so map-side combine collapses them to
  ONE row per document before the shuffle — shuffle volume is O(docs),
  not O(tokens).
- training: driver-side numpy logistic regression over a bounded
  hash-random sample (same pattern as the IVF/PQ codebook training —
  model quality needs a representative sample, not every row; serving
  cost is what must scale).

No UDFs anywhere; the scoring plan is whole-stage-codegen eligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .sampling import hash_bucket


def hashed_token_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1 << 18,
    seed: str = "feat|",
) -> DataFrame:
    """Per-document hashed bag-of-words: ``(id, bucket, tf)`` — one row
    per distinct feature bucket, tf = occurrences.  One shuffle on the
    document id, partially aggregated map-side."""
    toks = tokens(F.lower(F.col(text_col)))
    return (
        df.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(
            F.col(id_col),
            hash_bucket(F.col("__tok"), seed=seed, denom=n_buckets).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def score_linear(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1 << 18,
    bias: float = 0.0,
    seed: str = "feat|",
    score_col: str = "score",
) -> DataFrame:
    """Sigmoid(bias + mean token weight) per document.

    ``weights``: a ``(bucket, weight)`` table — small (≤ n_buckets
    rows), broadcast.  Unseen buckets weigh 0.  Mean (not sum) matches
    fasttext's averaged bag-of-features and keeps scores
    length-invariant.  Empty documents score ``sigmoid(bias)``.

    Plan: explode → broadcast left join → partial-agg sum/count per doc
    (one shuffle keyed on the doc id) → join scores back onto the input
    (second shuffle) — both shuffles are O(documents).
    """
    toks = tokens(F.lower(F.col(text_col)))
    exploded = df.select(
        F.col(id_col), F.explode_outer(toks).alias("__tok")
    ).select(
        F.col(id_col),
        F.when(
            F.col("__tok").isNotNull(),
            hash_bucket(F.col("__tok"), seed=seed, denom=n_buckets),
        ).alias("bucket"),
    )
    scored = (
        exploded.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__sw"),
            F.count("bucket").alias("__nt"),
        )
        .select(
            F.col(id_col),
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.lit(float(bias))
                            + F.when(
                                F.col("__nt") > 0,
                                F.col("__sw") / F.col("__nt"),
                            ).otherwise(F.lit(0.0))
                        )
                    )
                )
            ).alias(score_col),
        )
    )
    return df.join(scored, id_col)


def train_linear_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 1 << 18,
    train_cap: int = 50_000,
    epochs: int = 100,
    lr: float = 10.0,
    l2: float = 1e-6,
    seed: str = "train|",
):
    """Driver-side logistic regression on a bounded hash-random sample.

    Returns ``(weights_df, bias)`` ready for :func:`score_linear`.  The
    sample is the ``train_cap`` rows with the smallest md5(id) — the
    same deterministic, engine-reproducible sampler the IVF/PQ training
    uses; pulling it to the driver is a bounded plan-time collect, not a
    data-path collect.

    The MEAN feature (length-invariant, matching serving) scales each
    per-weight gradient by 1/n_tokens, so SGD needs an aggressive
    learning rate — the defaults (lr=10, 100 epochs) fit a
    single-token signal on a few hundred docs to ≥0.99 accuracy; timid
    fasttext-style lr≈0.5 underfits badly here.
    """
    import numpy as np

    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    sample = (
        df.select(F.col(id_col), F.col(text_col), F.col(label_col), key.alias("__k"))
        .orderBy("__k")
        .limit(train_cap)
        .collect()
    )
    feats = []
    ys = np.array([float(r[label_col]) for r in sample])
    import hashlib

    def bucket(tok: str) -> int:
        h = hashlib.md5(("feat|" + tok).encode()).hexdigest()
        return int(h[:15], 16) % n_buckets

    for r in sample:
        text = (r[text_col] or "").lower()
        feats.append([bucket(t) for t in text.split()])
    # pre-aggregate duplicate tokens: fancy-indexed `w[bks] -=` applies
    # ONE update per duplicate index (numpy buffering), so repeated
    # tokens would silently lose gradient mass without unique+counts
    uniq = [np.unique(f, return_counts=True) if f else (None, None) for f in feats]
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(epochs):
        for i, bks in enumerate(feats):
            if not bks:
                x = 0.0
            else:
                x = w[bks].sum() / len(bks)
            p = 1.0 / (1.0 + np.exp(-(b + x)))
            g = p - ys[i]
            if bks:
                bk, cnt = uniq[i]
                w[bk] -= lr * (g * cnt / len(bks) + l2 * w[bk])
            # damped bias step: the mean feature needs an aggressive lr,
            # the scalar bias does not — full lr makes it oscillate
            b -= 0.2 * lr * g
    nz = np.nonzero(w)[0]
    spark = df.sparkSession
    weights = spark.createDataFrame(
        [(int(i), float(w[i])) for i in nz], "bucket long, weight double"
    )
    return weights, b


def calibration_report(
    scored: DataFrame,
    label_col: str,
    score_col: str = "score",
    n_buckets: int = 10,
) -> DataFrame:
    """Per-score-bucket empirical positive rate — the calibration curve
    that turns a classifier score into a keep-threshold decision (pick
    the bucket where precision crosses the pipeline's bar; a
    well-calibrated scorer shows positive_rate ≈ mean_score per
    bucket).

    Output: (bucket, n_docs, mean_score, positive_rate), bucket =
    ``floor(score·n)`` clamped into [0, n).  One partial-agg groupBy;
    the mean accumulates per-row 6-dp scores as exact decimals so the
    number is partitioning-independent (engine-reproducible — the
    `operators.lm` convention).
    """
    b = F.least(
        F.floor(F.col(score_col) * n_buckets).cast("long"),
        F.lit(n_buckets - 1).cast("long"),
    )
    return (
        scored.withColumn("bucket", b)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (
                    F.sum(F.round(F.col(score_col), 6).cast("decimal(18,6)"))
                    / F.count(F.lit(1))
                ).cast("double"),
                6,
            ).alias("mean_score"),
            F.round(
                F.sum(F.col(label_col).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("positive_rate"),
        )
        .orderBy("bucket")
    )
